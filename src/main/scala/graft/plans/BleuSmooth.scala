package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Native BLEU-4 chencherry-method7 smoothing kernel.
  *
  * The smoothing cascade (method4 zero-count fill, then method5
  * neighbor averaging, then brevity penalty) was previously a column
  * expression tree: four ps CASEs with literal ln/exp lookup tables
  * feeding a p1f→p4f chain that Catalyst's project collapse inlines
  * into one enormous projection — janino COMPILATION of that tree, not
  * its execution, dominated score_bleu's bench time (~6 s cold vs
  * ~2.4 s warm). One static Java method replaces the whole tree; every
  * arithmetic step reproduces the SQL formulation's operation order
  * and type promotions exactly (same math.log/math.exp the literal
  * tables were computed from), so the DuckDB oracle hash-match is
  * unchanged. Reference semantics: NLTK sentence_bleu with
  * chencherry.method7 (reference test_proactive.py:376,
  * compute_scores.py:6).
  */
object BleuKernel {

  /** a = [c1, c2, c3, c4, c5, hl, rl] (clipped n-gram matches for
    * n=1..5, hypothesis/reference unigram totals).
    */
  def smooth(a: ArrayData): Double = {
    val c = Array(a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3),
      a.getLong(4))
    val hl = a.getLong(5)
    val rl = a.getLong(6)
    if (c(0) == 0L) return 0.0
    def denom(i: Int): Double = math.max(hl - (i - 1), 1L).toDouble
    // method4: zero counts get ln(hl) / (2^incvnt * 5 * denom)
    val ps = new Array[Double](4)
    var i = 1
    while (i <= 4) {
      ps(i - 1) =
        if (c(i - 1) > 0L) c(i - 1).toDouble / denom(i)
        else if (hl > 1L) {
          var inc = 1
          var j = 1
          while (j < i) { if (c(j - 1) == 0L) inc += 1; j += 1 }
          math.log(hl.toDouble) / ((math.pow(2.0, inc.toDouble) * 5.0) * denom(i))
        } else 0.0
      i += 1
    }
    val p5raw = c(4).toDouble / denom(5)
    // method5: average with neighboring orders, seeded by p1 + 1
    val p1f = ((ps(0) + 1.0) + ps(0) + ps(1)) / 3.0
    val p2f = (p1f + ps(1) + ps(2)) / 3.0
    val p3f = (p2f + ps(2) + ps(3)) / 3.0
    val p4f = (p3f + ps(3) + p5raw) / 3.0
    val bp = if (hl >= rl) 1.0 else math.exp(1.0 - rl.toDouble / hl.toDouble)
    bp * math.sqrt(math.sqrt(p1f * p2f * p3f * p4f))
  }
}

object BleuCounts {
  /** Clipped n-gram match counts for n = 1..5 between a hypothesis
    * and a reference token slice, plus the two unigram totals:
    * [c1..c5, hl, rl] — the whole `base` frame of the old
    * explode → count-shuffle → pivot shape as ONE per-row kernel
    * call (both sides are ≤ 10-token slices, so ≤ 50 grams/side —
    * a shuffle-free projection beats a corpus-gram exchange at any
    * scale). Gram identity is the exact space-joined string both
    * the old shape and the DuckDB oracle build; cn = Σ_gram
    * min(count_hyp, count_ref) per order.
    *
    * PRECONDITION (ADVICE r12): callers feed NON-EMPTY token arrays.
    * The legacy explode shape emitted NO row for an empty array; this
    * kernel (like shingleSet) emits a zero-count row for it. Every
    * in-repo tokenizer (`split` on a non-null string) satisfies the
    * precondition — a future caller whose tokenizer can yield `[]`
    * must filter empties first or accept the extra zero row.
    */
  def counts(p: ArrayData, g: ArrayData): ArrayData = {
    val np = p.numElements()
    val ng = g.numElements()
    val out = new Array[Long](7)
    out(5) = np.toLong
    out(6) = ng.toLong
    var n = 1
    while (n <= 5) {
      if (np >= n && ng >= n) {
        // reference gram counts for this order
        val ref = new java.util.HashMap[String, Int]()
        var i = 0
        while (i + n <= ng) {
          val sb = new java.lang.StringBuilder()
          var t = i
          while (t < i + n) {
            if (t > i) sb.append(' ')
            sb.append(g.getUTF8String(t).toString)
            t += 1
          }
          val k = sb.toString
          ref.put(k, ref.getOrDefault(k, 0) + 1)
          i += 1
        }
        // hypothesis counts, clipped against the reference's
        val hyp = new java.util.HashMap[String, Int]()
        i = 0
        while (i + n <= np) {
          val sb = new java.lang.StringBuilder()
          var t = i
          while (t < i + n) {
            if (t > i) sb.append(' ')
            sb.append(p.getUTF8String(t).toString)
            t += 1
          }
          val k = sb.toString
          hyp.put(k, hyp.getOrDefault(k, 0) + 1)
          i += 1
        }
        var c = 0L
        val it = hyp.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val r = ref.getOrDefault(e.getKey, 0)
          if (r > 0) c += math.min(e.getValue.intValue(), r)
        }
        out(n - 1) = c
      }
      n += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_bleu_counts(hyp array<string>, ref array<string>) ->
  * array<long>(7)` — see [[BleuCounts.counts]].
  */
case class BleuCountsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bleu_counts"

  override def nullSafeEval(a: Any, b: Any): Any =
    BleuCounts.counts(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.BleuCounts.counts($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BleuCountsExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_bleu_smooth(array<long>) -> double` */
case class BleuSmoothExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_bleu_smooth"

  override def nullSafeEval(a: Any): Any =
    BleuKernel.smooth(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.BleuKernel.smooth($a)")

  override protected def withNewChildInternal(newChild: Expression): BleuSmoothExpr =
    copy(child = newChild)
}
