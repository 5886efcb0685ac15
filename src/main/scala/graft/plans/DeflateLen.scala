package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native deflate-length kernel for the compression-ratio quality
  * signal (the CCNet/Gopher heuristic: natural text compresses to
  * ~0.3-0.5 of its size; templated/repetitive spam compresses far
  * harder, random noise barely at all). One Deflater per call, level
  * pinned for reproducibility within a deployment; the operator built
  * on it is rows-only (compressed length is a zlib-version detail, not
  * portable SQL), with the semantics pinned by property specs.
  */
object DeflateKernel {
  val Level = 6

  def deflatedLen(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(Level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** `graft_deflate_len(binary) -> long` */
case class DeflateLenExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(a: Any): Any =
    DeflateKernel.deflatedLen(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.DeflateKernel.deflatedLen($a)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}
