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
  def minhashSig(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val mins = Array.fill(32)(Long.MaxValue)
    val nShingles = if (n >= 3) n - 2 else 1
    var p = 0
    while (p < nShingles) {
      val sb = new java.lang.StringBuilder()
      var t = p
      val end = if (n >= 3) p + 3 else n
      while (t < end) {
        if (t > p) sb.append(' ')
        sb.append(a.getUTF8String(t).toString)
        t += 1
      }
      val base = hashUtf8(UTF8String.fromString(sb.toString))
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
    new GenericArrayData(mins)
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
