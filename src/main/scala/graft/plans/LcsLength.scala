package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: longest-common-subsequence length of two
  * token arrays — the kernel of ROUGE-L (reference
  * hanchen_recomp.py:76, rouge_scorer rougeL). Classic O(n·m) DP with
  * two rolling rows, emitted as straight-line Java by `doGenCode` so
  * scoring stays inside whole-stage codegen.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lcs"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    val prev = new Array[Long](m + 1)
    val cur = new Array[Long](m + 1)
    var i = 0
    while (i < n) {
      val xi = x.getUTF8String(i)
      var j = 0
      while (j < m) {
        cur(j + 1) =
          if (xi.equals(y.getUTF8String(j))) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      s"""
        int $n = $a.numElements();
        int $m = $b.numElements();
        long[] $prev = new long[$m + 1];
        long[] $cur = new long[$m + 1];
        for (int $i = 0; $i < $n; $i++) {
          org.apache.spark.unsafe.types.UTF8String $xi = $a.getUTF8String($i);
          for (int $j = 0; $j < $m; $j++) {
            if ($xi.equals($b.getUTF8String($j))) {
              $cur[$j + 1] = $prev[$j] + 1;
            } else {
              $cur[$j + 1] = java.lang.Math.max($prev[$j + 1], $cur[$j]);
            }
          }
          java.lang.System.arraycopy($cur, 0, $prev, 0, $m + 1);
        }
        ${ev.value} = $prev[$m];
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}
