package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `graft_ahash(payload: binary)` → a 64-bit ENERGY-ENVELOPE hash of a
  * RIFF/WAVE PCM payload, or NULL when the payload is not decodable
  * PCM audio (VERDICT r12 #3 — WAV samples are raw bytes after the
  * fmt/data chunks the header parser already walks; no codec library
  * exists or is needed).
  *
  * The audio analogue of dHash: the PCM stream is folded to a mono
  * sample-sum series, TRIMMED to its active span (onset alignment —
  * the peak-relative rule documented at [[AudioHash.ahash]]), split
  * into 65 EQUAL-length windows (the tail remainder is truncated, so
  * every window has exactly span/65 frames — integer-exact energies
  * with no cross-multiplied length normalization), and each of the 64
  * bits records whether window i+1 carries more energy (sum of
  * squared mono sums) than window i. Gradient-of-envelope, like
  * dHash's gradient-of-luma: the signature survives uniform gain
  * change (energy scales monotonically; the trim threshold is
  * peak-relative, so the span is gain-stable too), re-containering,
  * sample-level dither, and leading/trailing silence padding or
  * trimming (r14 — a fixed window grid let a one-window silence pad
  * shift every boundary and evade the firewall), which byte hashing
  * cannot give an audio column.
  *
  * Decode scope (total — NULL, never a throw): RIFF/WAVE, `fmt `
  * chunk with PCM format 1, 8-bit (unsigned) or 16-bit (signed LE)
  * samples, 1–8 channels, a `data` chunk; at least 65 frames after
  * truncation. The data chunk is capped at 1 GiB of samples — an
  * adversarial RIFF size cannot allocate past the payload's own
  * length, which Spark already bounds.
  *
  * Exactness for the planted-truth oracle: every step — sample
  * extraction, mono fold, equal-window split, integer energy sums,
  * 64 comparisons — is integer arithmetic a DuckDB oracle replays
  * bit-for-bit from the planted sample formula (energies fit BIGINT:
  * monoSum ≤ 8·2¹⁵ = 2¹⁸, squared 2³⁶, × window length ≤ 2²⁴ → 2⁶⁰).
  */
case class AudioHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_ahash"

  override def nullSafeEval(a: Any): Any =
    AudioHash.ahash(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("ah")
      s"""
      java.lang.Long $r = graft.plans.AudioHash.ahash($a);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): AudioHashExpr =
    copy(child = newChild)
}

object AudioHash {

  /** Envelope windows: 65 windows → 64 neighbor comparisons → 64 bits
    * (the 9-cells-for-8-bits dHash convention, in one dimension). */
  val Windows = 65

  /** ONSET ALIGNMENT (r14, VERDICT r13 #6): before windowing, the
    * signal is trimmed to its ACTIVE SPAN — leading and trailing
    * frames whose |mono sum| ≤ peak/64 (integer division) are
    * dropped. Without it the fixed window grid made the hash
    * shift-fragile: one window (~1.5 %) of prepended silence moved
    * every window boundary and could flip arbitrarily many bits, so a
    * trimmed/padded re-upload evaded the audio firewall that a
    * re-gain could not. The peak-relative threshold keeps the trim
    * EXACTLY gain-invariant: for any integer gain g, |m| > ⌊p/64⌋ ⟺
    * |g·m| > ⌊g·p/64⌋ (upper: ⌊gp/64⌋ < g⌊p/64⌋ + g ≤ g|m| when
    * |m| ≥ ⌊p/64⌋+1; lower: |m| ≤ ⌊p/64⌋ ⇒ g|m| ≤ g⌊p/64⌋ ≤
    * ⌊gp/64⌋), so the active span — and with it the hash — is
    * untouched by uniform gain. A degenerate all-zero mono fold
    * (e.g. exactly-cancelling stereo) has no envelope to align; it
    * keeps the untrimmed zero-energy hash (0), as before.
    *
    * Boxed so codegen can branch on decode failure. */
  def ahash(b: Array[Byte]): java.lang.Long = {
    val pcm = decodePcm(b)
    if (pcm == null) return null
    val (mono, nFrames) = pcm
    var peak = 0
    var j = 0
    while (j < nFrames) {
      val a = math.abs(mono(j)); if (a > peak) peak = a; j += 1
    }
    var f0 = 0
    var f1 = nFrames - 1
    if (peak > 0) {
      val thr = peak / 64
      while (math.abs(mono(f0)) <= thr) f0 += 1 // stops at the peak frame
      while (math.abs(mono(f1)) <= thr) f1 -= 1
    }
    val win = (f1 - f0 + 1) / Windows
    if (win == 0) return null
    val e = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      var s = 0L
      var f = f0 + w * win
      val end = f + win
      while (f < end) { val m = mono(f).toLong; s += m * m; f += 1 }
      e(w) = s
      w += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) hash |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** PCM decode to the per-frame mono sample SUM (not mean — integer
    * exactness beats per-frame division, and the envelope comparison
    * is scale-invariant). Returns (monoSums, nFrames) or null.
    */
  private[plans] def decodePcm(b: Array[Byte]): (Array[Int], Int) = {
    if (b == null || b.length < 44) return null
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return null
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    var fmtOk = false
    var channels = 0
    var bits = 0
    var dataAt = -1
    var dataLen = 0
    var i = 12
    while (dataAt < 0 && i + 8 <= b.length) {
      val size = le32(i + 4)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
        b(i + 3) == ' ' && size >= 16 && i + 8 + 16 <= b.length) {
        val fmt = le16(i + 8)
        channels = le16(i + 10)
        bits = le16(i + 22)
        fmtOk = fmt == 1 && (bits == 8 || bits == 16) &&
          channels >= 1 && channels <= 8
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
        b(i + 3) == 'a') {
        dataAt = i + 8
        // actual bytes present, whatever the RIFF size field claims
        dataLen = math.min(size, (b.length - dataAt).toLong).toInt
      }
      val step = 8L + size + (size & 1L)
      if (step <= 0 || i + step > Int.MaxValue) return null
      i += step.toInt
    }
    if (!fmtOk || dataAt < 0) return null
    val bytesPer = bits / 8
    val block = channels * bytesPer
    val nFrames = dataLen / block
    if (nFrames < Windows || nFrames.toLong * block > (1L << 30)) return null
    val mono = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      var s = 0
      var c = 0
      while (c < channels) {
        val p = dataAt + f * block + c * bytesPer
        s += (if (bits == 16) (le16(p) << 16) >> 16 // sign-extend
        else (b(p) & 0xff) - 128)
        c += 1
      }
      mono(f) = s
      f += 1
    }
    (mono, nFrames)
  }
}
