package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: ASYMMETRIC cosine — float query vector ×
  * int8-quantized candidate codes (graft_cosine_i8).
  *
  * The ANN serving-path scalar at 100 TB: candidates live as int8 codes
  * (4× smaller than float32, see embed_quantize), queries stay float.
  * The reconstructed candidate is ĉ = scale·codes, but a per-vector
  * symmetric scale CANCELS in cosine —
  * cos(q, ĉ) = Σqᵢ·s·cᵢ / (|q|·s·|c|) = cos(q, c) — so the kernel
  * ranks on the raw codes and never touches the scale column: the
  * serving index is codes-only, and the only loss vs the float path is
  * quantization rounding (|Δcos| ≤ ~dim·(s/2)·|q|∞ / norms, tiny at
  * int8 resolution). One fused loop, straight-line Java inside
  * whole-stage codegen, same shape as [[CosineSimilarity]].
  */
case class CosineFloatInt8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(IntegerType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine_i8"

  // Length mismatch → NULL (corrupt codes must not win a top-k slot),
  // matching graft_cosine's contract.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toIntArray()
    if (x.length != y.length) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble
      val yi = y(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        float[] $x = $a.toFloatArray();
        int[] $y = $b.toIntArray();
        if ($x.length != $y.length) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          int $n = $x.length;
          for (int $i = 0; $i < $n; $i++) {
            double xi = (double) $x[$i];
            double yi = (double) $y[$i];
            $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineFloatInt8 =
    copy(left = newLeft, right = newRight)
}
