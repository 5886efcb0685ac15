package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-doc signature kernels for the dedup operators.
  *
  * SimHash and MinHash signatures are pure per-document functions of
  * the token list — the previous explode + 64/32-wide-aggregate shapes
  * paid a full shuffle per corpus ONLY to dodge interpreted HOF
  * lambdas. These kernels are the right rung on the custom-op ladder:
  * one codegen'd Java loop per row, zero shuffles in the signature
  * build, and bit-for-bit the same values (token hashing uses Spark's
  * own XXH64 with xxhash64()'s seed 42, rotate/xor families and
  * 3-token shingling reproduce the former column formulations exactly —
  * spec fixtures pinned before and after the switch agree).
  */
object SignatureKernels {
  val XxSeed = 42L // Spark's xxhash64() default seed

  /** Deterministic xor constants for the 32 minhash families (same
    * xorshift chain the wide-agg formulation used).
    */
  val seedConsts: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(32) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x
    }
  }

  private def hashUtf8(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), XxSeed)

  /** 64-bit SimHash: per-bit ±1 majority over xxhash64(token). */
  def simhash(a: ArrayData): Long = {
    val n = a.numElements()
    val sums = new Array[Int](64)
    var p = 0
    while (p < n) {
      val h = hashUtf8(a.getUTF8String(p))
      var b = 0
      while (b < 64) {
        sums(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      p += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** 32 per-family minhash minima over 3-token shingles (docs shorter
    * than 3 tokens contribute one whole-text shingle), matching
    * shingleRows + the rotate/xor hash families.
    */
  private def minhashMins(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val mins = Array.fill(32)(Long.MaxValue)
    val nShingles = if (n >= 3) n - 2 else 1
    // shingle bytes assembled by DIRECT UTF-8 byte copy — the
    // StringBuilder formulation paid two UTF-8↔UTF-16 round-trips per
    // shingle; concatenating the raw token bytes with ' ' separators
    // hashes the exact same byte sequence (spec-pinned vs the column
    // formulation), at a fraction of the per-shingle cost.
    // Behavioral note for INVALID UTF-8 input (Spark does not
    // validate parquet string bytes): the old toString round-trip
    // replaced malformed sequences with U+FFFD before hashing; this
    // path hashes the raw bytes. The hash space is self-consistent
    // either way, but a band store built from a corrupt-bytes corpus
    // BEFORE this change will not collide with the same doc's new
    // signature — rebuild stores if such a corpus exists (the test
    // corpora are valid UTF-8 throughout).
    var buf = new Array[Byte](128)
    var p = 0
    while (p < nShingles) {
      var len = 0
      var t = p
      val end = if (n >= 3) p + 3 else n
      while (t < end) {
        val s = a.getUTF8String(t)
        val nb = s.numBytes()
        val need = len + nb + 1
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (t > p) { buf(len) = ' '; len += 1 }
        s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
        len += nb
        t += 1
      }
      val base = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, XxSeed)
      var i = 0
      while (i < 32) {
        val rot = if (i == 0) base
          else (base << i) | (base >>> (64 - i))
        val v = rot ^ seedConsts(i)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      p += 1
    }
    mins
  }

  def minhashSig(a: ArrayData): ArrayData =
    new GenericArrayData(minhashMins(a))

  /** The 8 LSH band values DIRECTLY from the tokens — signature build
    * and banding fused into one kernel pass. Bit-identical to the old
    * column formulation `transform(sequence(0, 7), b ->
    * xxhash64(cast(b AS string), slice(sig, b*4+1, 4)))` (spec-pinned):
    * Spark's XxHash64 folds children left-to-right with the running
    * hash as seed — the band index's decimal string bytes first, then
    * the 4 sig longs in order.
    *
    * Why this exists (the hot-path lesson): when a consumer prunes to
    * `bands` alone, CollapseProject inlines the `sig` column INTO the
    * transform lambda — textually one reference, but the lambda body
    * runs once PER ELEMENT, so the whole 32-min signature kernel
    * evaluated 8× per row (measured 6× wall on the sf1 probe path).
    * Deriving bands in one self-contained expression makes the band
    * build exactly one kernel eval per row under ANY projection
    * pruning, which no optimizer rewrite can undo.
    */
  /** Distinct 3-token shingle strings, first-occurrence order (see
    * [[ShingleSetExpr]]). Byte-level concat — no UTF-16 round-trips.
    */
  def shingleSet(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val win = if (n >= 3) 3 else n
    val nShingles = if (n >= 3) n - 2 else 1
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[UTF8String](nShingles)
    var buf = new Array[Byte](128)
    var p = 0
    while (p < nShingles) {
      var len = 0
      var t = p
      val end = p + win
      while (t < end) {
        val s = a.getUTF8String(t)
        val nb = s.numBytes()
        val need = len + nb + 1
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (t > p) { buf(len) = ' '; len += 1 }
        s.writeToMemory(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
        len += nb
        t += 1
      }
      // fromBytes WRAPS the array (no copy) — the reused buffer must
      // be copied out per shingle or later windows would overwrite
      // earlier set entries in place
      val sh = UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, len))
      if (seen.add(sh)) out.add(sh)
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  def minhashBands(a: ArrayData): ArrayData =
    new GenericArrayData(bandsOf(minhashMins(a)))

  private def bandsOf(mins: Array[Long]): Array[Long] = {
    val out = new Array[Long](8)
    var b = 0
    while (b < 8) {
      val bs = UTF8String.fromString(java.lang.Integer.toString(b))
      var h = XXH64.hashUnsafeBytes(
        bs.getBaseObject, bs.getBaseOffset, bs.numBytes(), XxSeed)
      var i = b * 4
      val end = i + 4
      while (i < end) { h = XXH64.hashLong(mins(i), h); i += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Signature AND bands in one pass: 40 longs — [0,32) the minima,
    * [32,40) the band values. The shape `minhashSigs` consumes: `sig`
    * and `bands` become cheap slices of ONE kernel output, so a
    * consumer pruned to either column (or both) pays exactly one
    * kernel eval per row — the bands-only probe path can inline the
    * kernel into its single slice (1 eval), and a sig+bands consumer
    * references the kernel twice, which blocks CollapseProject from
    * inlining a non-cheap expression (still 1 eval behind the
    * projection barrier).
    */
  def minhashAll(a: ArrayData): ArrayData = {
    val mins = minhashMins(a)
    val bands = bandsOf(mins)
    val out = new Array[Long](40)
    System.arraycopy(mins, 0, out, 0, 32)
    System.arraycopy(bands, 0, out, 32, 8)
    new GenericArrayData(out)
  }
}

/** `graft_simhash(array<string>) -> long` */
case class SimhashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    SignatureKernels.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SignatureKernels.simhash($a)")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

/** `graft_minhash_sig(array<string>) -> array<long>` (32 minima) */
case class MinhashSigExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(a: Any): Any =
    SignatureKernels.minhashSig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SignatureKernels.minhashSig($a)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

/** `graft_minhash_bands(array<string>) -> array<long>` (8 LSH band
  * values, signature + banding in one kernel pass — see
  * [[SignatureKernels.minhashBands]]).
  */
case class MinhashBandsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override def nullSafeEval(a: Any): Any =
    SignatureKernels.minhashBands(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SignatureKernels.minhashBands($a)")

  override protected def withNewChildInternal(newChild: Expression): MinhashBandsExpr =
    copy(child = newChild)
}

/** `graft_shingle_set(array<string>) -> array<string>` — the DISTINCT
  * 3-token shingles of a token list, built per row in one kernel pass
  * (byte-level concat, first-occurrence order; docs shorter than 3
  * tokens yield their whole text as the one shingle — the
  * [[graft.operators.Dedup.shingleRows]] convention, including the
  * empty doc's [""], which matches the ANSI oracle's `[text]` arm).
  *
  * Exists so per-doc shingle SETS are a narrow projection: the old
  * shape exploded shingle rows into a corpus-token-sized groupBy /
  * collect_set exchange just to reassemble what is a pure per-row
  * function — at 100 TB that shuffle moves every token of the corpus
  * once, for nothing. Consumers: dedup_cluster, ngram_jaccard, the
  * dedup_pipeline candidate gather. (contam_ngram keeps the exploded
  * ROW shape deliberately — it needs per-occurrence multiplicity.)
  */
case class ShingleSetExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override def nullSafeEval(a: Any): Any =
    SignatureKernels.shingleSet(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SignatureKernels.shingleSet($a)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSetExpr =
    copy(child = newChild)
}

/** `graft_minhash_all(array<string>) -> array<long>` (40 longs:
  * 32 signature minima ++ 8 band values — see
  * [[SignatureKernels.minhashAll]]).
  */
case class MinhashAllExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_all"

  override def nullSafeEval(a: Any): Any =
    SignatureKernels.minhashAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SignatureKernels.minhashAll($a)")

  override protected def withNewChildInternal(newChild: Expression): MinhashAllExpr =
    copy(child = newChild)
}
