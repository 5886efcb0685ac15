package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: multiset token overlap of two token
  * arrays — Σ_tok min(count_left, count_right), the numerator of the
  * SQuAD-style token F1 (reference test_proactive.py:110-128). One
  * hash-count of the left side, one consuming pass over the right:
  * O(n+m) per row, emitted by `doGenCode` so scoring stays inside
  * whole-stage codegen. A per-row function deserving no shuffle — this
  * kernel is what lets score_f1 (and the stream_score ingest gate) run
  * NARROW instead of the explode + two-aggregation shape.
  */
case class TokenOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_f1_common"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val counts = new java.util.HashMap[Any, Long]()
    var i = 0
    while (i < x.numElements()) {
      val t = x.getUTF8String(i)
      val c = counts.get(t)
      counts.put(t, (if (c == null) 0L else c) + 1L)
      i += 1
    }
    var common = 0L
    var j = 0
    while (j < y.numElements()) {
      val t = y.getUTF8String(j)
      val c = counts.get(t)
      if (c != null && c > 0L) {
        common += 1L
        counts.put(t, c - 1L)
      }
      j += 1
    }
    common
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      s"""
        ${ev.value} = 0L;
        java.util.HashMap<Object, Long> $counts =
          new java.util.HashMap<Object, Long>();
        for (int $i = 0; $i < $a.numElements(); $i++) {
          Object $t = $a.getUTF8String($i);
          Long $c = $counts.get($t);
          $counts.put($t, ($c == null ? 0L : $c.longValue()) + 1L);
        }
        for (int $j = 0; $j < $b.numElements(); $j++) {
          Object $t = $b.getUTF8String($j);
          Long $c = $counts.get($t);
          if ($c != null && $c.longValue() > 0L) {
            ${ev.value} += 1L;
            $counts.put($t, $c.longValue() - 1L);
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenOverlap =
    copy(left = newLeft, right = newRight)
}
