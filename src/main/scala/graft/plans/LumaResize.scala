package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Native Catalyst expression: in-engine image RESIZE —
  * `graft_luma_resize(payload, w, h)` box-filters the engine-decoded
  * PNG luma plane ([[Phash.decodeGray]]: Inflater + RFC 2083
  * defilters, zero codec libraries) down to a w×h grid of byte means
  * and returns it as a BINARY thumbnail (row-major, one luma byte
  * per cell). The canonical encoder-preprocessing step for a
  * multimodal column — mm_phash's 9×8 block-mean generalized to an
  * arbitrary target grid — kept row-local and codegen'd like the
  * rest of the mm kernels. Box means (not nearest-neighbor) so every
  * source pixel contributes: a one-pixel edit moves exactly the cell
  * that contains it (spec). Returns null for payloads the decoder
  * refuses (non-PNG containers, adversarial/oversized headers — the
  * mm_phash total-ness contract) and for non-positive or oversized
  * target grids.
  */
case class LumaResizeExpr(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType, IntegerType, IntegerType)

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_luma_resize"

  override def nullSafeEval(p: Any, w: Any, h: Any): Any =
    LumaResize.resize(p.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, w, h) => {
      s"""
        ${ev.value} = graft.plans.LumaResize.resize($p, $w, $h);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LumaResizeExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LumaResize {

  /** Target grids beyond this are refused (a 1 MB thumbnail — one
    * luma byte per cell — for a single row is an input error, not a
    * workload). */
  val MaxTargetPixels = 1 << 20

  def resize(b: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    if (tw <= 0 || th <= 0 || tw.toLong * th > MaxTargetPixels) return null
    val gray = Phash.decodeGray(b)
    if (gray == null) return null
    val (g, w, h) = gray
    val out = new Array[Byte](tw * th)
    var cy = 0
    while (cy < th) {
      // cell (cx, cy) averages pixel block [x0, x1) × [y0, y1); the
      // max() keeps blocks non-empty when the target grid is finer
      // than the source (tiny images sample nearest pixels — the
      // dhash convention)
      val y0 = (cy.toLong * h / th).toInt
      val y1 = math.max(y0 + 1, ((cy + 1).toLong * h / th).toInt)
      var cx = 0
      while (cx < tw) {
        val x0 = (cx.toLong * w / tw).toInt
        val x1 = math.max(x0 + 1, ((cx + 1).toLong * w / tw).toInt)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += g(y * w + x); x += 1 }
          y += 1
        }
        out(cy * tw + cx) =
          (sum / ((x1 - x0).toLong * (y1 - y0))).toByte
        cx += 1
      }
      cy += 1
    }
    out
  }
}
