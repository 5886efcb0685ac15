package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_unigram(array<string>, pieces, logprobs) -> array<string>`:
  * Viterbi segmentation of whitespace tokens into subword pieces under
  * a trained unigram language model over pieces (the SentencePiece
  * unigram algorithm, Kudo 2018 — the OTHER public subword family next
  * to graft_bpe's merge-rule greedy loop; the reference tokenizes with
  * a trained subword tokenizer, test_proactive.py:202-207).
  *
  * The piece table (strings + log-probabilities) is FOLDABLE — both
  * arrays evaluate once at plan time, ride to executors inside the
  * expression, and generated code reaches the table through one
  * `addReferenceObj` handle, so surrounding operators stay in
  * whole-stage codegen and serving is a NARROW per-row kernel.
  *
  * Segmentation maximizes Σ log p(piece) over all decompositions via
  * the standard O(len · MaxPieceLen) Viterbi recurrence on the word's
  * symbol sequence. Symbols follow graft_bpe's Sennrich convention —
  * the end-of-word marker rides on the final character — so the piece
  * stream decodes losslessly with the SAME decode rule (concat, marker
  * → space, trim) and the two tokenizer families are drop-in
  * interchangeable downstream. A symbol absent from the table (unseen
  * character at serving time) falls back to [[UnigramTable.UnkLogProb]]
  * so segmentation totals stay defined on any input.
  */
case class UnigramSegmentExpr(child: Expression, pieces: Seq[String],
    logProbs: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {

  require(pieces.length == logProbs.length,
    s"${pieces.length} pieces vs ${logProbs.length} log-probs")

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_unigram"

  @transient private lazy val table = new UnigramTable(pieces, logProbs)

  override def nullSafeEval(a: Any): Any =
    table.segmentArray(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev, a => s"$ref.segmentArray($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentExpr =
    copy(child = newChild)
}

object UnigramTable {
  /** End-of-word marker — graft_bpe's, so decode rules are shared. */
  val Eow = "</w>"

  /** Log-prob floor for symbols outside the table (unseen characters
    * at serving time). Far below any trained piece, so an unknown
    * symbol is only ever taken alone, never inside a longer span. */
  val UnkLogProb: Double = -100.0
}

/** Piece table + the Viterbi segmenter. One instance per plan, shared
  * by every task in an executor JVM → the word cache is a bounded
  * ConcurrentHashMap (the BpeTable shape; natural text is Zipfian, so
  * most words hit).
  */
final class UnigramTable(pieceSeq: Seq[String], lpSeq: Seq[Double])
    extends Serializable {

  import UnigramTable.{Eow, UnkLogProb}

  private val CacheCap = 65536

  private val logp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    pieceSeq.iterator.zip(lpSeq.iterator).foreach { case (p, lp) =>
      m.put(p, lp)
    }
    m
  }

  /** Longest piece in SYMBOLS (the marker-bearing final char counts as
    * one symbol) — the Viterbi inner loop's bound. */
  private val maxSyms: Int = {
    var mx = 1
    pieceSeq.foreach { p =>
      val core = if (p.endsWith(Eow)) p.dropRight(Eow.length) else p
      if (core.length > mx) mx = core.length
    }
    mx
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** Viterbi over the word's symbol sequence: dp(i) = best log-prob of
    * segmenting syms[0,i); ties resolve to the LONGER final piece
    * (fewer pieces — the deterministic canonical form). */
  def segmentWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    val n = w.length
    if (n == 0) return Array.empty
    // syms(i): single-char string; the final one carries the marker
    val syms = new Array[String](n)
    var c = 0
    while (c < n) {
      syms(c) =
        if (c == n - 1) String.valueOf(w.charAt(c)) + Eow
        else String.valueOf(w.charAt(c))
      c += 1
    }
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // start index of dp(i)'s last piece
    var i = 1
    while (i <= n) {
      dp(i) = Double.NegativeInfinity
      back(i) = i - 1
      val lo = math.max(0, i - maxSyms)
      var j = i - 1
      // j descends, so the candidate final piece GROWS as the loop
      // runs; >= lets a later (longer) piece take equal-score ties —
      // the canonical fewest-pieces form, deterministic either way
      var sb = new java.lang.StringBuilder(syms(i - 1))
      while (j >= lo) {
        if (j < i - 1) sb = new java.lang.StringBuilder(syms(j)).append(sb)
        val piece = sb.toString
        val lpBoxed = logp.get(piece)
        val lp =
          if (lpBoxed != null) lpBoxed.doubleValue()
          else if (j == i - 1) UnkLogProb // single symbol always legal
          else Double.NegativeInfinity
        if (lp != Double.NegativeInfinity && dp(j) + lp >= dp(i)) {
          dp(i) = dp(j) + lp
          back(i) = j
        }
        j -= 1
      }
      i += 1
    }
    // walk back
    val rev = new scala.collection.mutable.ArrayBuffer[String]()
    var k = n
    while (k > 0) {
      val j = back(k)
      val b = new java.lang.StringBuilder()
      var t = j
      while (t < k) { b.append(syms(t)); t += 1 }
      rev += b.toString
      k = j
    }
    val out = rev.reverseIterator.toArray
    if (cache.size < CacheCap) cache.put(w, out)
    out
  }

  def segmentArray(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val w = a.getUTF8String(i).toString
        if (w.nonEmpty) {
          val pieces = segmentWord(w)
          var p = 0
          while (p < pieces.length) {
            out += UTF8String.fromString(pieces(p))
            p += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
