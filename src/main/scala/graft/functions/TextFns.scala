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
  /** string.punctuation as a Java/RE2 character class (both engines). */
  val PunctClass: String = """[!"#$%&'()*+,\-./:;<=>?@\[\]^_`{|}~]"""
  val ArticlesRe: String = """\b(a|an|the)\b"""

  def normalize(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(c), PunctClass, ""),
        ArticlesRe, " "),
      """\s+""", " "))

  /** DuckDB twin of [[normalize]] (RE2; needs explicit 'g' flag). */
  def normalizeSql(e: String): String = {
    val punct = """[!"#$%&''()*+,\-./:;<=>?@\[\]^_`{|}~]""" // '' = escaped quote
    s"""trim(regexp_replace(regexp_replace(regexp_replace(lower($e), '$punct', '', 'g'), '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g'))"""
  }

  def tokens(c: Column): Column = split(c, " ")
}
