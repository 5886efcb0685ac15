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
    * counts. Shared by both expressions. */
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

  def topGramCount(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val out = new Array[Long](2)
    val g = m - n + 1
    if (n >= 1 && g >= 1) {
      val (tokId, _) = intern(toks, m)
      var pn = 1L
      var j = 0
      while (j < n) { pn *= P; j += 1 }
      val gcap = java.lang.Integer.highestOneBit(math.max(2, g) * 2 - 1) * 2
      val gmask = gcap - 1
      val gkeys = new Array[Long](gcap)
      val gcnt = new Array[Int](gcap)
      var top = 0
      var k = 0L
      j = 0
      while (j < n) { k = k * P + tokId(j); j += 1 }
      var i = 0
      while (i < g) {
        if (i > 0) k = k * P + tokId(i + n - 1) - pn * tokId(i - 1)
        val h = mix(k)
        var p = (h & gmask).toInt
        val key = if (h == 0L) 1L else h
        while (gkeys(p) != 0L && gkeys(p) != key) p = (p + 1) & gmask
        if (gkeys(p) == 0L) { gkeys(p) = key; gcnt(p) = 1 }
        else gcnt(p) += 1
        if (gcnt(p) > top) top = gcnt(p)
        i += 1
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
      var i = 0
      // prefix char sums so a gram's length is O(1)
      val prefix = new Array[Long](m + 1)
      i = 0
      while (i < m) { prefix(i + 1) = prefix(i) + tokChars(i); i += 1 }
      var slot = 0
      while (slot < DupNs.length + TopNs.length) {
        val isDup = slot < DupNs.length
        val n = if (isDup) DupNs(slot) else TopNs(slot - DupNs.length)
        val g = m - n + 1
        if (g >= 1) {
          // rolling polynomial key: k_i = Σ_j id[i+j]·P^(n-1-j),
          // advanced per position; pn = P^n for the drop-out term
          var pn = 1L
          var j = 0
          while (j < n) { pn *= P; j += 1 }
          val gcap =
            java.lang.Integer.highestOneBit(math.max(2, g) * 2 - 1) * 2
          val gmask = gcap - 1
          val gkeys = new Array[Long](gcap)
          val gcnt = new Array[Int](gcap)
          val glen = new Array[Long](gcap)
          var dup = 0L
          var top = 0L
          var k = 0L
          j = 0
          while (j < n) { k = k * P + tokId(j); j += 1 }
          i = 0
          while (i < g) {
            if (i > 0) k = k * P + tokId(i + n - 1) - pn * tokId(i - 1)
            val len = prefix(i + n) - prefix(i) + (n - 1)
            val h = mix(k)
            var p = (h & gmask).toInt
            // 0 marks empty: remap the (2^-64) colliding real key
            val key = if (h == 0L) 1L else h
            while (gkeys(p) != 0L && gkeys(p) != key) p = (p + 1) & gmask
            if (gkeys(p) == 0L) {
              gkeys(p) = key; gcnt(p) = 1; glen(p) = len
              if (!isDup && len > top) top = len
            } else {
              gcnt(p) += 1
              if (isDup) dup += glen(p)
              else {
                val mass = gcnt(p).toLong * glen(p)
                if (mass > top) top = mass
              }
            }
            i += 1
          }
          out(slot) = (if (isDup) dup else top) * 10000L / math.max(lt, 1L)
        }
        slot += 1
      }
    }
    new GenericArrayData(out)
  }
}
