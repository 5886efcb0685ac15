package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text building blocks shared across operators.
  *
  * `normalize` mirrors the reference's answer/text normalization
  * (reference test_proactive.py:51-66, 89-108): lowercase → strip
  * `string.punctuation` chars → drop articles (a|an|the) → collapse
  * whitespace. Pure `functions._` composition → whole-stage codegen.
  */
object TextFns {
  /** string.punctuation as a Java/RE2 character class (both engines).
    * All 32 chars — including backslash (`\\\\` in the class), which
    * an earlier formulation omitted (caught by the normalize-kernel
    * fuzz spec; the reference's string.punctuation strips it). */
  val PunctClass: String = """[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""
  val ArticlesRe: String = """\b(a|an|the)\b"""

  /** One fused byte-scan kernel (plans.NormalizeText) — bit-identical
    * to the regex-chain formulation (fuzz-spec'd against
    * [[normalizeLegacy]]); built via the sql bridge so call sites need
    * no function-registry session setup.
    */
  def normalize(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.plans.NormalizeTextExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** The original column formulation — kept as the kernel's spec
    * mirror (the oracle keeps the equivalent SQL in [[normalizeSql]]).
    */
  def normalizeLegacy(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(c), PunctClass, ""),
        ArticlesRe, " "),
      """\s+""", " "))

  /** DuckDB twin of [[normalize]] (RE2; needs explicit 'g' flag).
    * Known engine divergence OUTSIDE the oracle corpus: RE2's `\b`
    * is ASCII-word-only while Java's counts Unicode letters/digits
    * (so RE2 drops "the" in "thé", Java keeps it). The test corpus
    * is ASCII, where both agree; the kernel follows Java (the
    * engine's own semantics).
    */
  def normalizeSql(e: String): String = {
    val punct = """[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]""" // '' = escaped quote
    s"""trim(regexp_replace(regexp_replace(regexp_replace(lower($e), '$punct', '', 'g'), '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g'))"""
  }

  def tokens(c: Column): Column = split(c, " ")
}
