package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** src_xml_pages — wiki-dump-style XML page reader on core Spark
  * (no external XML datasource): the single most common NON-crawl
  * corpus a training pipeline ingests is a MediaWiki dump — one huge
  * XML file of `<page>` records — and the standard scalable trick is
  * to make the TEXT source split on the record close tag
  * (`lineSep "</page>"`): Hadoop's line reader honors custom
  * delimiters across split boundaries, so a 100 GB dump still fans
  * out to parallel tasks, each holding whole records (unlike
  * `multiLine` XML/JSON parsing, which pins one task per file).
  * Per record, the fields extract by (?s) non-greedy regex — the
  * Java↔RE2 common subset the Html family already relies on:
  *
  *   - page_id: the FIRST `<id>` inside the record (revision ids
  *     come later in document order; anchoring on the page-level id
  *     is the dump's documented layout).
  *   - title / ns / redirect flag: the page routing fields — every
  *     dump consumer filters ns = 0 (articles) and usually drops
  *     redirects; both are surfaced, neither is silently applied.
  *   - text: the latest revision's `<text>` body with the five XML
  *     predefined entities decoded (&amp; LAST so partial decodes
  *     cannot cascade — the Html.cleanSql discipline).
  *
  * The fragment AFTER the final `</page>` (the `</mediawiki>`
  * trailer, or the siteinfo header when a split starts mid-file)
  * yields no title and is dropped by the title guard — record
  * framing noise, not data loss (spec-pinned).
  */
object Xml {

  /** Read a page-per-record frame (page_id, title, ns, is_redirect,
    * text) from a MediaWiki-shaped dump at `path`.
    */
  def readPages(s: SparkSession, path: String): DataFrame =
    s.read.option("lineSep", "</page>").text(path)
      .select(
        regexp_extract(col("value"), "(?s)<id>([0-9]+)</id>", 1)
          .as("id_str"),
        regexp_extract(col("value"), "(?s)<title>(.*?)</title>", 1)
          .as("title"),
        regexp_extract(col("value"), "(?s)<ns>([0-9]+)</ns>", 1)
          .as("ns_str"),
        when(col("value").contains("<redirect"), 1L).otherwise(0L)
          .as("is_redirect"),
        regexp_extract(col("value"), "(?s)<text[^>]*>(.*?)</text>", 1)
          .as("raw_text"))
      .where(col("title") =!= "")
      .select(
        when(col("id_str") === "", -1L)
          .otherwise(col("id_str").cast("long")).as("page_id"),
        col("title"),
        when(col("ns_str") === "", 0L)
          .otherwise(col("ns_str").cast("long")).as("ns"),
        col("is_redirect"),
        expr("""replace(replace(replace(replace(replace(raw_text,
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
          '&apos;', chr(39)), '&amp;', '&')""").as("text"))

  /** The standard article filter most consumers want: main-namespace,
    * non-redirect pages. Kept separate so the audit view (how many
    * redirects, which namespaces) stays one `readPages` away.
    */
  def articles(s: SparkSession, path: String): DataFrame =
    readPages(s, path)
      .where(col("ns") === 0L && col("is_redirect") === 0L)
}
