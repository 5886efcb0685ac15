package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** `graft_media_meta(payload: binary)` → array<long> of container
  * metadata parsed straight from the payload's own header bytes — no
  * codec library, pure JVM byte reads (the container formats put
  * dimensions/sample-rate in fixed, public header layouts precisely so
  * consumers can read them without decoding):
  *
  *   [0] format    0 unknown · 1 PNG · 2 JPEG · 3 WAV
  *   [1] width     PNG IHDR / JPEG SOF (0 for WAV/unknown)
  *   [2] height    PNG IHDR / JPEG SOF (0 for WAV/unknown)
  *   [3] channels  PNG color type → channel count / JPEG SOF component
  *                 count / WAV fmt channels
  *   [4] sample_rate  WAV fmt (0 for images)
  *   [5] bits      PNG bit depth / JPEG sample precision / WAV bits
  *                 per sample
  *
  * Header layouts implemented from the public format specifications:
  * PNG (RFC 2083 §3: 8-byte signature, IHDR first chunk — width/height
  * as 4-byte big-endian at offsets 16/20, bit depth 24, color type 25),
  * JPEG/JFIF (ITU T.81 §B: marker segments `FF xx` with 2-byte
  * big-endian lengths; any SOFn frame header carries precision,
  * height, width, component count), WAV (RIFF chunks, little-endian;
  * the `fmt ` chunk carries channels at +2, sample rate at +4, bits
  * per sample at +14). Malformed or truncated payloads degrade to
  * format 0 with zero fields — the kernel is total, it never throws.
  *
  * One static Java method inside whole-stage codegen; the per-row cost
  * is a handful of bounded byte reads (JPEG scans marker segments but
  * stops at SOS/EOI, so it never walks entropy data).
  */
case class MediaMetaExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_media_meta"

  override def nullSafeEval(a: Any): Any =
    MediaHeaderKernel.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.MediaHeaderKernel.parse($a)")

  override protected def withNewChildInternal(newChild: Expression): MediaMetaExpr =
    copy(child = newChild)
}

object MediaHeaderKernel {
  val FmtUnknown = 0L
  val FmtPng = 1L
  val FmtJpeg = 2L
  val FmtWav = 3L

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG color type → samples per pixel (RFC 2083 §4.1.1). */
  private def pngChannels(colorType: Int): Long = colorType match {
    case 0 => 1L // grayscale
    case 2 => 3L // truecolor
    case 3 => 1L // palette index
    case 4 => 2L // gray + alpha
    case 6 => 4L // truecolor + alpha
    case _ => 0L
  }

  /** SOFn markers that carry a frame header (T.81 Table B.1): C0–CF
    * minus C4 (DHT), C8 (JPG extension), CC (DAC).
    */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  def parse(b: Array[Byte]): ArrayData = {
    val out = new Array[Long](6)
    if (b.length >= 8 && java.util.Arrays.equals(
        java.util.Arrays.copyOf(b, 8), PngSig)) {
      // IHDR must be the first chunk: 4-byte length + "IHDR" at 8,
      // then width/height/depth/colorType
      if (b.length >= 26 && b(12) == 'I' && b(13) == 'H' &&
          b(14) == 'D' && b(15) == 'R') {
        out(0) = FmtPng
        out(1) = be32(b, 16)
        out(2) = be32(b, 20)
        out(5) = u8(b, 24).toLong
        out(3) = pngChannels(u8(b, 25))
      }
    } else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      // JPEG: walk marker segments from just past SOI
      var i = 2
      var done = false
      while (!done && i + 1 < b.length) {
        if (u8(b, i) != 0xff) { done = true } // not a marker: corrupt
        else {
          var j = i
          while (j + 1 < b.length && u8(b, j + 1) == 0xff) j += 1 // fill bytes
          val m = if (j + 1 < b.length) u8(b, j + 1) else 0
          if (isSof(m) && j + 9 < b.length) {
            out(0) = FmtJpeg
            out(5) = u8(b, j + 4).toLong   // sample precision
            out(2) = be16(b, j + 5).toLong // lines (height)
            out(1) = be16(b, j + 7).toLong // samples per line (width)
            out(3) = u8(b, j + 9).toLong   // component count
            done = true
          } else if (m == 0xd9 || m == 0xda) { // EOI / SOS: stop
            done = true
          } else if (m >= 0xd0 && m <= 0xd7 || m == 0x01) { // no payload
            i = j + 2
          } else if (j + 3 < b.length) {
            i = j + 2 + be16(b, j + 2) // skip the segment by its length
          } else done = true
        }
      }
    } else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E') {
      // WAV: scan RIFF chunks for "fmt " (chunks pad to even length)
      var i = 12
      var done = false
      while (!done && i + 8 <= b.length) {
        val size = le32(b, i + 4)
        if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
            b(i + 3) == ' ' && size >= 16 && i + 8 + 16 <= b.length) {
          out(0) = FmtWav
          out(3) = le16(b, i + 10).toLong // channels
          out(4) = le32(b, i + 12)        // sample rate
          out(5) = le16(b, i + 22).toLong // bits per sample
          done = true
        } else {
          val step = 8L + size + (size & 1L)
          if (step <= 0 || i + step > Int.MaxValue) done = true
          else i += step.toInt
        }
      }
    }
    new GenericArrayData(out)
  }
}
