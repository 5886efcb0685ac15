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
  * formula the DuckDB oracle evaluates inline
  * (((hp·8191 + i·127 + 1) % 1000) − 500, 1-based dim i), and the dot
  * product accumulates left-to-right in double — bit-identical to the
  * oracle's list_sum comprehension. Replaces a ~2 300-node explicit
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
          dot += emb(i - 1).toDouble *
            ((hp * 8191 + i * 127 + 1) % 1000 - 500).toDouble
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
