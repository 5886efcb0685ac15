package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** `graft_lsh_keys(embedding)` → array<long> of `Bands` random-
  * hyperplane band keys, each packing `bits` sign bits
  * (operators.Similarity's dedup_embed bucketing).
  *
  * The hyperplane components come from the same deterministic integer
  * formula the DuckDB oracle evaluates inline — a squared-Lehmer mix
  * (s = hp·127 + i; h = (s·48271) % 2147483647; c = (h·h % 2147483647)
  * % 1001 − 500, 1-based dim i) — and the dot product accumulates
  * left-to-right in double, bit-identical to the oracle's list_sum
  * comprehension. The mix must be NONLINEAR in the hyperplane index:
  * the first cut used a linear congruence ((hp·8191 + i·127 + 1) %
  * 1000 − 500), which makes hyperplane hp+1's components a constant
  * residue-shift of hp's — correlated sign bits, band keys piling
  * onto a few values (sf10 measured: top buckets 2700 vectors against
  * a 16-vector target, 1.8×10⁸ candidate pairs, dedup_embed 75× for
  * 10× data). Squaring mod the Mersenne prime breaks the linearity;
  * the same corpus re-probed reads ~max-60 buckets and linear
  * candidates. Replaces a ~2 300-node explicit
  * column tree whose janino compilation dominated the query: here the
  * whole kernel is ONE static Java loop, still inside whole-stage
  * codegen.
  */
case class LshBandKeys(child: Expression, bands: Int, maxBits: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_lsh_keys"

  override def nullSafeEval(a: Any): Any =
    LshBandKeys.keys(a.asInstanceOf[ArrayData], bands, maxBits, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.plans.LshBandKeys.keys($a, $bands, $maxBits, $bits)")

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

object LshBandKeys {
  def keys(a: ArrayData, bands: Int, maxBits: Int, bits: Int): ArrayData = {
    val emb = a.toFloatArray()
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var key = 0L
      var l = 0
      while (l < bits) {
        val hp = j * maxBits + l
        var dot = 0.0
        var i = 1 // 1-based dim index, matching the SQL comprehension
        while (i <= emb.length) {
          val h = ((hp * 127 + i).toLong * 48271L) % 2147483647L
          dot += emb(i - 1).toDouble *
            ((h * h % 2147483647L) % 1001L - 500L).toDouble
          i += 1
        }
        if (dot >= 0) key |= 1L << l
        l += 1
      }
      out(j) = key
      j += 1
    }
    new GenericArrayData(out)
  }
}
