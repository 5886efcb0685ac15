package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bpe(array<string>, merges) -> array<string>`: byte-pair
  * encoding of whitespace tokens into subword pieces under a trained
  * merge table (the public BPE algorithm of Sennrich et al. 2016; the
  * reference tokenizes chat text with a trained BPE tokenizer,
  * test_proactive.py:202-207).
  *
  * The merge table is a FOLDABLE literal (rank-ordered "left right"
  * strings) evaluated once at plan time — the table rides to executors
  * inside the expression, and generated code reaches it through one
  * `addReferenceObj` handle: one virtual call per row, no per-token
  * lambda interpretation, surrounding operators stay in whole-stage
  * codegen. Encoding is the standard greedy loop: repeatedly apply the
  * LOWEST-rank merge present among adjacent symbols (all occurrences
  * per pass) until none applies. A bounded per-executor word cache
  * exploits the Zipfian repeat rate of natural text.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe"

  @transient private lazy val table = new BpeTable(merges)

  override def nullSafeEval(a: Any): Any =
    table.encodeArray(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, a => s"$ref.encodeArray($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** Parsed merge ranks + the encode loop. One instance per plan,
  * shared by every task in an executor JVM → the word cache is a
  * bounded ConcurrentHashMap.
  */
final class BpeTable(merges: Seq[String]) extends Serializable {

  private val CacheCap = 65536

  // (left, right) -> rank; rank order IS merge priority
  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case (s, i) => m.put(s, i) }
    m
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  private def rankOf(a: String, b: String): Int = {
    val r = ranks.get(a + " " + b)
    if (r == null) Int.MaxValue else r.intValue()
  }

  def encodeWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms = new Array[String](w.length)
    var c = 0
    while (c < w.length) { syms(c) = String.valueOf(w.charAt(c)); c += 1 }
    // Sennrich learn_bpe.py symbol init: end-of-word marker rides on
    // the final character, so encoding is invertible (decode = concat
    // pieces, marker -> space)
    if (syms.length > 0) syms(syms.length - 1) = syms(syms.length - 1) + "</w>"
    var done = syms.length < 2
    while (!done) {
      // lowest-rank pair present among adjacent symbols
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rankOf(syms(i), syms(i + 1))
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // apply ALL occurrences of that pair, left to right
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && rankOf(syms(j), syms(j + 1)) == bestRank) {
            out += syms(j) + syms(j + 1)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.toArray
        done = syms.length < 2
      }
    }
    if (cache.size < CacheCap) cache.put(w, syms)
    syms
  }

  def encodeArray(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val w = a.getUTF8String(i).toString
        if (w.nonEmpty) {
          val pieces = encodeWord(w)
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
