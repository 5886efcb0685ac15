package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL nine Gopher Table A1 repetition
  * signals (Rae et al. 2021) in one pass over a token array —
  * duplicate-n-gram character mass for n = 5..10 and most-common-
  * n-gram mass for n = 2..4, each as integer basis points of the
  * document's character length (the data_card convention, so the
  * DuckDB oracle matches bit-for-bit).
  *
  * This is the preference-order-(b) upgrade of the row-local SQL
  * fold (operators.TextAnalysis r11 history): the lambda pipeline
  * (array_sort of per-n gram structs + aggregate folds) evaluates
  * interpreted per element; this kernel does the identical set-wise
  * arithmetic through ONE static method inside whole-stage codegen.
  * Per row: tokens intern to dense int ids via linear-probe open
  * addressing (the TokenOverlap table shape), gram keys are a
  * 64-bit polynomial over the id sequence maintained incrementally
  * (O(1) per position after the first), and each n's gram counts
  * land in a long-keyed open-addressed count map carrying the gram
  * char length — counts ARE the set-wise quantities:
  *
  *   dup_n = Σ over distinct grams (count − 1) · len   (n = 5..10)
  *   top_n = max over distinct grams count · len        (n = 2..4)
  *
  * No sort, no per-gram allocation, no boxing; two table allocations
  * per (row, n). A within-doc key collision would need two distinct
  * id sequences of one doc and one n to collide at 64 bits — the
  * same caveat the SQL fold documented for xxhash64 over the
  * token-hash slice.
  *
  * Children: (tokens array<string>, doc char length long). Returns
  * array<long> of 9 bp values in declaration order
  * [dup5..dup10, top2, top3, top4].
  */
case class GopherRepetition(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(StringType), LongType)

  override def dataType: DataType = ArrayType(LongType)

  override def prettyName: String = "graft_gopher_rep"

  override def nullSafeEval(toks: Any, lt: Any): Any =
    GopherRepetition.signals(
      toks.asInstanceOf[ArrayData], lt.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.GopherRepetition.signals($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GopherRepetition =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: COUNT-based top-n-gram stats —
  * (most-common-n-gram occurrence count, total n-gram count) as a
  * 2-element long array. The count-flavored sibling of
  * [[GopherRepetition]] (which grades CHARACTER mass): this is what
  * text_repetition's top_bigram_ratio and quality_filter's
  * top_bigram gate consume, and making it a row-local kernel removes
  * the (doc, gram) count shuffle + per-doc roll-up + join back those
  * operators paid — the quality tier becomes fully narrow. Same
  * machinery: token interning, rolling polynomial keys, one
  * open-addressed count map.
  *
  * Children: (tokens array<string>, n int literal). Returns
  * [top_count, total_grams]; a doc with fewer than n tokens returns
  * [0, 0] (the old left join's coalesce).
  */
case class TopGramCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(StringType), org.apache.spark.sql.types.IntegerType)

  override def dataType: DataType = ArrayType(LongType)

  override def prettyName: String = "graft_top_ngram_count"

  override def nullSafeEval(toks: Any, n: Any): Any =
    GopherRepetition.topGramCount(
      toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.GopherRepetition.topGramCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopGramCount =
    copy(left = newLeft, right = newRight)
}

object GopherRepetition {

  /** n-gram spans graded: dup mass for 5..10, top mass for 2..4. */
  private val DupNs = Array(5, 6, 7, 8, 9, 10)
  private val TopNs = Array(2, 3, 4)

  /** Odd multiplier for the rolling polynomial gram key (the
    * splitmix64 increment constant — fixed, seed-free: the key only
    * needs within-row injectivity, not adversarial resistance). */
  private val P = 0x9e3779b97f4a7c15L

  private def mix(z0: Long): Long = {
    // splitmix64 finalizer: spreads the polynomial's low-entropy top
    // bits before the table masks them
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Interns tokens to dense ids (≥ 1; 0 marks "empty" downstream)
    * via linear-probe open addressing; also records per-token char
    * counts. Shared by both expressions. The fail-loud bound follows
    * the TokenOverlap precedent (not the mm kernels' return-null
    * convention): 2²⁹ tokens means a multi-GiB single row, which is
    * an upstream ingestion bug to surface, not a payload variant to
    * tolerate — silently emitting zero signals would PASS the doc
    * through every repetition ceiling. */
  private def intern(toks: ArrayData, m: Int): (Array[Long], Array[Long]) = {
    require(m < (1 << 29),
      s"GopherRepetition: $m tokens in one row (must be < ${1 << 29})")
    val cap = java.lang.Integer.highestOneBit(math.max(2, m) * 2 - 1) * 2
    val mask = cap - 1
    val keys = new Array[UTF8String](cap)
    val ids = new Array[Int](cap)
    val tokId = new Array[Long](m) // as long for key arithmetic
    val tokChars = new Array[Long](m)
    var nextId = 1
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      if (t == null) { tokId(i) = 0L; tokChars(i) = 0L }
      else {
        var p = t.hashCode & mask
        while (keys(p) != null && !keys(p).equals(t)) p = (p + 1) & mask
        if (keys(p) == null) { keys(p) = t; ids(p) = nextId; nextId += 1 }
        tokId(i) = ids(p).toLong
        tokChars(i) = t.numChars().toLong
      }
      i += 1
    }
    (tokId, tokChars)
  }

  /** Fills the open-addressed n-gram count map over `tokId`: rolling
    * polynomial keys (k_i = Σ_j id[i+j]·P^(n-1-j), advanced O(1) per
    * position via the P^n drop-out term), splitmix-mixed, 0 marking
    * an empty slot (the 2⁻⁶⁴ real zero key remaps to 1). `prefix`
    * (char-prefix sums) may be null when gram char lengths are not
    * needed. Returns (keys, counts, lens — null iff prefix was null,
    * capacity). The ONE copy of the rolling-hash and probing
    * invariants both expressions share.
    */
  private def countGrams(tokId: Array[Long], prefix: Array[Long],
      m: Int, n: Int): (Array[Long], Array[Int], Array[Long], Int) = {
    val g = m - n + 1
    var pn = 1L
    var j = 0
    while (j < n) { pn *= P; j += 1 }
    val gcap = java.lang.Integer.highestOneBit(math.max(2, g) * 2 - 1) * 2
    val gmask = gcap - 1
    val gkeys = new Array[Long](gcap)
    val gcnt = new Array[Int](gcap)
    val glen = if (prefix == null) null else new Array[Long](gcap)
    var k = 0L
    j = 0
    while (j < n) { k = k * P + tokId(j); j += 1 }
    var i = 0
    while (i < g) {
      if (i > 0) k = k * P + tokId(i + n - 1) - pn * tokId(i - 1)
      val h = mix(k)
      var p = (h & gmask).toInt
      val key = if (h == 0L) 1L else h
      // When char lengths are tracked, gram identity is (hash, len):
      // a 64-bit collision between distinct grams must ALSO collide
      // on char length to merge — restores the old shape's grouping
      // guard at zero extra cost (len is already O(1) from prefix).
      val len = if (glen == null) 0L else prefix(i + n) - prefix(i) + (n - 1)
      while (gkeys(p) != 0L &&
          !(gkeys(p) == key && (glen == null || glen(p) == len)))
        p = (p + 1) & gmask
      if (gkeys(p) == 0L) {
        gkeys(p) = key
        gcnt(p) = 1
        if (glen != null) glen(p) = len
      } else gcnt(p) += 1
      i += 1
    }
    (gkeys, gcnt, glen, gcap)
  }

  def topGramCount(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val out = new Array[Long](2)
    val g = m - n + 1
    if (n >= 1 && g >= 1) {
      val (tokId, tokChars) = intern(toks, m)
      // same (hash, len) gram identity as signals() — the char-prefix
      // collision guard must be consistent across the two expressions
      // (ADVICE r12), or a 64-bit collision would merge grams here
      // while signals() keeps them apart
      val prefix = new Array[Long](m + 1)
      var i = 0
      while (i < m) { prefix(i + 1) = prefix(i) + tokChars(i); i += 1 }
      val (gkeys, gcnt, _, gcap) = countGrams(tokId, prefix, m, n)
      var top = 0
      var p = 0
      while (p < gcap) {
        if (gkeys(p) != 0L && gcnt(p) > top) top = gcnt(p)
        p += 1
      }
      out(0) = top.toLong
      out(1) = g.toLong
    }
    new GenericArrayData(out)
  }

  def signals(toks: ArrayData, lt: Long): ArrayData = {
    val m = toks.numElements()
    val out = new Array[Long](DupNs.length + TopNs.length)
    if (m >= 2) {
      val (tokId, tokChars) = intern(toks, m)
      // prefix char sums so a gram's length is O(1)
      val prefix = new Array[Long](m + 1)
      var i = 0
      while (i < m) { prefix(i + 1) = prefix(i) + tokChars(i); i += 1 }
      var slot = 0
      while (slot < DupNs.length + TopNs.length) {
        val isDup = slot < DupNs.length
        val n = if (isDup) DupNs(slot) else TopNs(slot - DupNs.length)
        if (m - n + 1 >= 1) {
          val (gkeys, gcnt, glen, gcap) = countGrams(tokId, prefix, m, n)
          var dup = 0L
          var top = 0L
          var p = 0
          while (p < gcap) {
            if (gkeys(p) != 0L) {
              if (isDup) {
                if (gcnt(p) >= 2) dup += (gcnt(p) - 1).toLong * glen(p)
              } else {
                val mass = gcnt(p).toLong * glen(p)
                if (mass > top) top = mass
              }
            }
            p += 1
          }
          out(slot) = (if (isDup) dup else top) * 10000L / math.max(lt, 1L)
        }
        slot += 1
      }
    }
    new GenericArrayData(out)
  }
}
