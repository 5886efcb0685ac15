package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_normalize(string) -> string` — the reference's text
  * normalization (test_proactive.py:51-66, 89-108: lowercase → strip
  * `string.punctuation` → drop articles a|an|the → collapse
  * whitespace → trim) fused into ONE byte-scan kernel.
  *
  * Bit-identical to the column formulation it replaces
  * (`trim(regexp_replace(regexp_replace(regexp_replace(lower(c),
  * PUNCT, ''), '\b(a|an|the)\b', ' '), '\s+', ' '))` — fuzz-spec'd
  * against it, and the DuckDB oracle keeps the expanded regex form):
  *
  *  - lowercase is UTF8String.toLowerCase — the exact call Spark's
  *    own `lower()` codegen makes;
  *  - every regex class involved is pure ASCII under Java's default
  *    (non-UNICODE_CHARACTER_CLASS) semantics — `string.punctuation`
  *    is an ASCII set, `\b` counts [a-zA-Z0-9_] only, `\s` is
  *    [ \t\n\x0B\f\r] — so non-ASCII UTF-8 bytes (all ≥ 0x80) pass
  *    through untouched and a byte-level scan reproduces the regex
  *    chain exactly, including `\b(a|an|the)\b` == "a maximal
  *    word-char run equal to a/an/the" (matched on the
  *    punct-stripped text, same order as the chain);
  *  - trim strips ASCII space only, matching Spark's `trim`.
  *
  * Bit-identity caveat: on INVALID UTF-8 (Spark does not validate
  * parquet string bytes) the regex chain round-trips through
  * java.lang.String, replacing malformed sequences with U+FFFD, while
  * this kernel passes the original bytes through (treating them as
  * non-word, non-space, non-punct — `wordAt` returns non-word for
  * broken sequences). Valid UTF-8 — which the fuzz spec covers and
  * every test corpus satisfies — is bit-identical; corrupt bytes
  * survive here instead of being silently rewritten, which is the
  * better ingestion-debugging behavior anyway.
  *
  * Why: normalization fronts the whole scoring family (score_bleu/f1/
  * em/rouge/has_answer, text_normalize, mr ops, curate stage 1) and
  * three chained regex engines per row were the dominant per-row cost
  * on those paths at sf1 — one branch-free byte pass is ~5-10×
  * cheaper and keeps the projection inside whole-stage codegen.
  */
case class NormalizeTextExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(a: Any): Any =
    NormalizeText.normalize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.NormalizeText.normalize($a)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeText {

  /** Python string.punctuation, the class the reference strips. */
  private val punct: Array[Boolean] = {
    val t = new Array[Boolean](128)
    """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".foreach(c => t(c) = true)
    t
  }

  @inline private def isPunct(b: Byte): Boolean = b >= 0 && punct(b)

  /** Java regex `\b` word chars. The quirk that matters (verified
    * empirically against java.util.regex): WITHOUT
    * UNICODE_CHARACTER_CLASS, `\w` is ASCII but `\b`'s boundary test
    * is `ch == '_' || Character.isLetterOrDigit(ch)` — UNICODE
    * letters and digits count (so "thé" / "字a" hold their articles),
    * while marks, soft hyphens and punctuation do not. Returns the
    * codepoint's word-ness and its UTF-8 byte length (packed:
    * len << 1 | isWord); invalid sequences are non-word, length 1.
    */
  private def wordAt(b: Array[Byte], i: Int, n: Int): Int = {
    val b0 = b(i) & 0xff
    if (b0 < 0x80) {
      val w = (b0 >= 'a' && b0 <= 'z') || (b0 >= '0' && b0 <= '9') ||
        b0 == '_' || (b0 >= 'A' && b0 <= 'Z')
      return (1 << 1) | (if (w) 1 else 0)
    }
    val len =
      if (b0 >= 0xc0 && b0 <= 0xdf) 2
      else if (b0 >= 0xe0 && b0 <= 0xef) 3
      else if (b0 >= 0xf0 && b0 <= 0xf7) 4
      else 1
    if (len == 1 || i + len > n) return (1 << 1) // stray byte: non-word
    var cp = b0 & (0x3f >> (len - 1))
    var j = 1
    while (j < len) {
      val bj = b(i + j) & 0xff
      if ((bj & 0xc0) != 0x80) return (1 << 1) // invalid: non-word, len 1
      cp = (cp << 6) | (bj & 0x3f)
      j += 1
    }
    (len << 1) | (if (Character.isLetterOrDigit(cp)) 1 else 0)
  }

  /** Java regex `\s` (ASCII). */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def normalize(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val n = b.length
    // pass 1: strip punctuation
    val t1 = new Array[Byte](n)
    var n1 = 0
    var i = 0
    while (i < n) {
      if (!isPunct(b(i))) { t1(n1) = b(i); n1 += 1 }
      i += 1
    }
    // pass 2: replace article word-runs with a space (runs may mix
    // ASCII and multibyte word chars; only the pure-ASCII runs
    // "a"/"an"/"the" are articles)
    val t2 = new Array[Byte](n1)
    var n2 = 0
    i = 0
    while (i < n1) {
      val w0 = wordAt(t1, i, n1)
      if ((w0 & 1) == 1) {
        var j = i + (w0 >> 1)
        while (j < n1 && { val w = wordAt(t1, j, n1); (w & 1) == 1 && { j += (w >> 1); true } }) {}
        val len = j - i
        val isArticle =
          (len == 1 && t1(i) == 'a') ||
          (len == 2 && t1(i) == 'a' && t1(i + 1) == 'n') ||
          (len == 3 && t1(i) == 't' && t1(i + 1) == 'h' && t1(i + 2) == 'e')
        if (isArticle) { t2(n2) = ' '; n2 += 1 }
        else { System.arraycopy(t1, i, t2, n2, len); n2 += len }
        i = j
      } else { t2(n2) = t1(i); n2 += 1; i += 1 }
    }
    // pass 3: collapse whitespace runs to one space, then trim spaces
    val t3 = new Array[Byte](n2)
    var n3 = 0
    i = 0
    while (i < n2) {
      if (isWs(t2(i))) {
        while (i < n2 && isWs(t2(i))) i += 1
        t3(n3) = ' '; n3 += 1
      } else { t3(n3) = t2(i); n3 += 1; i += 1 }
    }
    var st = 0
    var en = n3
    while (st < en && t3(st) == ' ') st += 1
    while (en > st && t3(en - 1) == ' ') en -= 1
    UTF8String.fromBytes(t3, st, en - st)
  }
}
