package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: multiset token overlap of two token
  * arrays — Σ_tok min(count_left, count_right), the numerator of the
  * SQuAD-style token F1 (reference test_proactive.py:110-128). One
  * hash-count of the left side, one consuming pass over the right:
  * O(n+m) per row through ONE static method inside whole-stage
  * codegen. The count table is an open-addressed array pair (token
  * keys + primitive int counts) presized from the left array's length
  * at ≤0.5 load — no java.util.HashMap, no Long boxing per token, two
  * allocations per row regardless of token count. A per-row function
  * deserving no shuffle — this kernel is what lets score_f1 (and the
  * stream_score ingest gate) run NARROW instead of the explode + two-
  * aggregation shape.
  */
case class TokenOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_f1_common"

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenOverlap.common(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.TokenOverlap.common($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenOverlap =
    copy(left = newLeft, right = newRight)
}

object TokenOverlap {

  /** Multiset overlap via linear-probe open addressing: capacity is the
    * next power of two ≥ 2·|left| (load factor ≤ 0.5, so probe chains
    * stay short), keys are the UTF8String views the array already
    * holds, counts are primitive ints in a parallel array.
    */
  def common(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    // n >= 2^29 would overflow the Int capacity math below (negative
    // array size); a single row holding half a billion tokens is far
    // past any real document — fail loud rather than wrap.
    require(n < (1 << 29),
      s"TokenOverlap: left side has $n tokens (must be < ${1 << 29} per row)")
    val cap = java.lang.Integer.highestOneBit(math.max(2, n) * 2 - 1) * 2
    val mask = cap - 1
    val keys = new Array[UTF8String](cap)
    val cnts = new Array[Int](cap)
    var nullsLeft = 0
    var i = 0
    while (i < n) {
      val t = a.getUTF8String(i)
      if (t == null) nullsLeft += 1
      else {
        var p = t.hashCode & mask
        while (keys(p) != null && !keys(p).equals(t)) p = (p + 1) & mask
        if (keys(p) == null) { keys(p) = t; cnts(p) = 1 }
        else cnts(p) += 1
      }
      i += 1
    }
    var commonN = 0L
    var j = 0
    while (j < m) {
      val t = b.getUTF8String(j)
      if (t == null) {
        if (nullsLeft > 0) { commonN += 1L; nullsLeft -= 1 }
      } else {
        var p = t.hashCode & mask
        while (keys(p) != null && !keys(p).equals(t)) p = (p + 1) & mask
        if (keys(p) != null && cnts(p) > 0) { commonN += 1L; cnts(p) -= 1 }
      }
      j += 1
    }
    commonN
  }
}
