package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_phrase_hits(toks, phrase)` → array<int> of the 0-based
  * positions where the phrase's tokens appear adjacently in the token
  * array. One straight-line Java loop per row inside whole-stage
  * codegen — the equivalent `filter(sequence(...), i -> element_at…)`
  * column expression runs its lambda INTERPRETED per position
  * (measured 1.7 s vs 0.3 s at sf0.1 for search_phrase). The phrase
  * is a plan literal resolved to UTF8String constants at expression
  * build; a null token never matches (same contract as the SQL
  * comparison's null semantics under filter).
  */
case class PhraseHitsExpr(child: Expression, phrase: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_phrase_hits"

  private lazy val phraseU8: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def nullSafeEval(a: Any): Any =
    PhraseHitsExpr.hits(a.asInstanceOf[ArrayData], phraseU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java SOURCE type name: classOf[Array[_]].getName returns the JVM
    // binary form "[L...;" which janino rejects ("Unexpected token [")
    // — the broken cast silently dropped the whole stage to interpreted
    // eval, exactly what this kernel exists to avoid
    val ref = ctx.addReferenceObj("phrase", phraseU8,
      s"${classOf[UTF8String].getName}[]")
    defineCodeGen(ctx, ev, a => s"graft.plans.PhraseHitsExpr.hits($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseHitsExpr =
    copy(child = newChild)
}

object PhraseHitsExpr {
  def hits(a: ArrayData, phrase: Array[UTF8String]): ArrayData = {
    val n = a.numElements()
    val k = phrase.length
    if (k == 0 || n < k) return new GenericArrayData(Array.emptyIntArray)
    var buf = new Array[Int](4)
    var m = 0
    var i = 0
    while (i + k <= n) {
      var j = 0
      var ok = true
      while (ok && j < k) {
        val t = a.getUTF8String(i + j)
        ok = t != null && t.equals(phrase(j))
        j += 1
      }
      if (ok) {
        if (m == buf.length) buf = java.util.Arrays.copyOf(buf, m * 2)
        buf(m) = i
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, m))
  }
}
