package graft.plans

import graft.functions.PorterStemmer
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_stem(array<string>) -> array<string>`: Porter-stems every
  * token longer than 3 chars (rouge_scorer's use_stemmer semantics,
  * reference hanchen_recomp.py:77). One virtual call per ROW (not per
  * token, and no interpreted lambda): `doGenCode` emits a static call
  * to [[StemTokens.stemArray]], keeping the surrounding operators in
  * whole-stage codegen.
  */
case class StemTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "graft_stem"

  override def nullSafeEval(a: Any): Any =
    StemTokens.stemArray(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.StemTokens.stemArray($a)")

  override protected def withNewChildInternal(newChild: Expression): StemTokens =
    copy(child = newChild)
}

object StemTokens {
  def stemArray(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val tok = a.getUTF8String(i).toString
        out(i) = UTF8String.fromString(PorterStemmer.stemToken(tok))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
