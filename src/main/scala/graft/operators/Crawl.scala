package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl-side curation tier, part 2 (r18) — the three gates that run
  * BETWEEN warc_parse and html_extract in a real pipeline (CCNet /
  * RefinedWeb / Dolma position them before any text is extracted):
  *
  *  - url_canon: URL canonicalization + URL-level dedup. Crawls see
  *    the same page under many spellings (mixed-case scheme/host,
  *    `www.`, explicit default port, tracking params, fragments,
  *    trailing slash); canonicalizing and collapsing BEFORE fetch/
  *    extract is the cheapest dedup rung of all — it needs no content.
  *  - license_detect: license / AI-use signal classification (SPDX
  *    identifiers, Creative-Commons statements, all-rights-reserved
  *    notices, `<meta name="robots">` noai/noindex directives) — the
  *    policy gate VERDICT r17 named as the remaining crawl-side
  *    absence beyond blocklist_filter's URL lists.
  *  - robots_gate: robots.txt parse + longest-prefix-match gating
  *    with crawl-delay extraction — the politeness contract a crawler
  *    must evaluate per (host, path) before fetching.
  *
  * Like the Html family (Html.scala), the raw inputs are DERIVED
  * deterministically from (doc_id, source, text) and the construction
  * is replayed verbatim in each DuckDB oracle, so all three queries
  * are hash-proven end-to-end. Scale shape: license_detect and
  * robots_gate are pure per-row projections (scan speed at 100 TB);
  * url_canon adds exactly one shuffle — the window over the canonical
  * key, which is what URL-level dedup fundamentally requires (group
  * sizes are bounded by the variant count, so no skew).
  */
object Crawl {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** Params any crawl pipeline strips: pure tracking, never content. */
  val TrackingParamPat = "^(utm_[a-z]+|fbclid|gclid|ref)="

  // ---- url_canon -------------------------------------------------------

  /** Deterministic messy raw URL per doc. The canonical core is keyed
    * on doc_id div 2, so consecutive ids are re-crawls of the SAME
    * page under different spellings; variant doc_id % 4 picks the
    * spelling. Variants 0/1/3 canonicalize to the bare core (dup
    * groups of size 2 when both pair members use them); variant 2
    * carries a REAL query param (page=2) that must SURVIVE
    * canonicalization, so it lands in its own group — the spec pins
    * both behaviors.
    */
  private[graft] def withRawUrl(d: DataFrame): DataFrame =
    d.withColumn("base", expr(
        "concat('https://', source, '.example.com/doc/', doc_id div 2)"))
      .withColumn("url", expr("""
        CASE cast(doc_id % 4 as int)
          WHEN 0 THEN base
          WHEN 1 THEN concat('HTTPS://WWW.', upper(source),
            '.EXAMPLE.COM:443/doc/', doc_id div 2,
            '?utm_source=feed&utm_campaign=x')
          WHEN 2 THEN concat(base, '?page=2&fbclid=abc123#sec-2')
          ELSE concat(base, '/?ref=home&utm_medium=social')
        END"""))
      .drop("base")

  private val rawUrlCte = """
    raws AS (
      SELECT doc_id,
        'https://' || source || '.example.com/doc/' || (doc_id // 2)
          AS base,
        CASE CAST(doc_id % 4 AS INT)
          WHEN 0 THEN 'https://' || source || '.example.com/doc/'
            || (doc_id // 2)
          WHEN 1 THEN 'HTTPS://WWW.' || upper(source)
            || '.EXAMPLE.COM:443/doc/' || (doc_id // 2)
            || '?utm_source=feed&utm_campaign=x'
          WHEN 2 THEN 'https://' || source || '.example.com/doc/'
            || (doc_id // 2) || '?page=2&fbclid=abc123#sec-2'
          ELSE 'https://' || source || '.example.com/doc/'
            || (doc_id // 2) || '/?ref=home&utm_medium=social'
        END AS url
      FROM documents)"""

  /** Canonicalization over a frame carrying `url`: drop the fragment;
    * lowercase scheme and host; strip `www.` and the explicit default
    * port; strip one trailing slash (unless the path IS `/`); drop
    * tracking params, keep the rest. No replacement-group backrefs
    * anywhere — Spark spells them `$1` and DuckDB `\1`, so the chain
    * sticks to extract + rebuild, which both engines replay verbatim.
    */
  private[graft] def canonicalize(u: DataFrame): DataFrame =
    u.withColumn("nofrag", expr("regexp_replace(url, '#.*$', '')"))
      .withColumn("scheme", expr(
        "lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1))"))
      .withColumn("host", expr("""
        regexp_replace(regexp_replace(
          lower(regexp_extract(nofrag, '^[A-Za-z]+://([^/?]+)', 1)),
          '^www\\.', ''), ':443$', '')"""))
      .withColumn("rest", expr(
        "regexp_extract(nofrag, '^[A-Za-z]+://[^/?]+(.*)$', 1)"))
      .withColumn("path0", expr("regexp_extract(rest, '^([^?]*)', 1)"))
      .withColumn("path", expr("""
        CASE WHEN path0 = '' THEN '/'
             WHEN length(path0) > 1 AND path0 LIKE '%/'
               THEN left(path0, length(path0) - 1)
             ELSE path0 END"""))
      .withColumn("q", expr(s"""
        array_join(filter(split(
            regexp_extract(rest, '[?](.*)$$', 1), '&'),
          p -> p != '' AND NOT p rlike '$TrackingParamPat'), '&')"""))
      .withColumn("canon", expr(
        "concat(scheme, '://', host, path," +
          " CASE WHEN q != '' THEN concat('?', q) ELSE '' END)"))
      .drop("nofrag", "scheme", "rest", "path0", "path", "q")

  private[graft] def urlCanon(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("canon"))
    canonicalize(withRawUrl(d))
      .select(col("doc_id"), col("host"), col("canon"))
      .withColumn("group_size", count(lit(1)).over(w).cast("long"))
      .withColumn("dup_rank",
        row_number().over(w.orderBy(col("doc_id"))).cast("long"))
  }

  private val opUrlCanon = Op(
    "url_canon",
    (s, dir) => urlCanon(docs(s, dir)),
    Some(s"""
      WITH $rawUrlCte,
      c AS (
        SELECT doc_id, url,
          regexp_replace(url, '#.*$$', '') AS nofrag
        FROM raws),
      parts AS (
        SELECT doc_id,
          lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) AS scheme,
          regexp_replace(regexp_replace(
            lower(regexp_extract(nofrag, '^[A-Za-z]+://([^/?]+)', 1)),
            '^www\\.', ''), ':443$$', '') AS host,
          regexp_extract(nofrag, '^[A-Za-z]+://[^/?]+(.*)$$', 1) AS rest
        FROM c),
      np AS (
        SELECT doc_id, scheme, host,
          regexp_extract(rest, '^([^?]*)', 1) AS path0,
          COALESCE(array_to_string(list_filter(string_split(
              regexp_extract(rest, '[?](.*)$$', 1), '&'),
            p -> p != '' AND NOT regexp_matches(p, '$TrackingParamPat')),
            '&'), '') AS q
        FROM parts),
      canon AS (
        SELECT doc_id, host,
          scheme || '://' || host ||
          (CASE WHEN path0 = '' THEN '/'
                WHEN length(path0) > 1 AND path0 LIKE '%/'
                  THEN left(path0, length(path0) - 1)
                ELSE path0 END) ||
          (CASE WHEN q != '' THEN '?' || q ELSE '' END) AS canon
        FROM np)
      SELECT doc_id, host, canon,
        CAST(COUNT(*) OVER (PARTITION BY canon) AS BIGINT) AS group_size,
        CAST(ROW_NUMBER() OVER (PARTITION BY canon ORDER BY doc_id)
          AS BIGINT) AS dup_rank
      FROM canon"""))

  // ---- license_detect --------------------------------------------------

  /** Injects the deterministic license / robots-directive signal into
    * the synthetic page (doc_id % 5 picks the signal; 4 = none). The
    * page end marker appears exactly once, so plain replace() is an
    * exact splice on both engines.
    */
  private[graft] def withSignals(h: DataFrame): DataFrame =
    h.withColumn("sig", expr("""
        CASE cast(doc_id % 5 as int)
          WHEN 0 THEN '<meta name="robots" content="noai, noindex">'
          WHEN 1 THEN '<footer>Licensed under CC BY-SA 4.0</footer>'
          WHEN 2 THEN '<!-- SPDX-License-Identifier: MIT -->'
          WHEN 3 THEN '<footer>All Rights Reserved</footer>'
          ELSE ''
        END"""))
      .withColumn("html",
        expr("replace(html, '</body></html>', concat(sig, '</body></html>'))"))
      .drop("sig")

  private val signalsCte = """
    sigs AS (
      SELECT doc_id, source,
        replace(html, '</body></html>',
          (CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN '<meta name="robots" content="noai, noindex">'
            WHEN 1 THEN '<footer>Licensed under CC BY-SA 4.0</footer>'
            WHEN 2 THEN '<!-- SPDX-License-Identifier: MIT -->'
            WHEN 3 THEN '<footer>All Rights Reserved</footer>'
            ELSE ''
          END) || '</body></html>') AS html
      FROM pages)"""

  /** Per-doc license / AI-use verdict over a frame carrying `html`.
    * Detection is generic (the patterns know nothing about the
    * synthesis): SPDX wins over CC wins over all-rights-reserved;
    * trainable = no noai directive AND not rights-reserved. An
    * UNKNOWN license stays trainable here — the conservative flip is
    * one predicate, and keeping `none` distinct from `arr` in the
    * output is what lets a caller choose either policy.
    */
  private[graft] def licenseDetect(h: DataFrame): DataFrame =
    h.withColumn("spdx", expr(
        "regexp_extract(html, 'SPDX-License-Identifier: ([A-Za-z0-9.+-]+)', 1)"))
      .withColumn("cc", expr(
        "regexp_extract(html, 'CC BY[-A-Z]* [0-9][0-9.]*', 0)"))
      .withColumn("robots_meta", expr(
        """regexp_extract(html, '<meta name="robots" content="([^"]*)"', 1)"""))
      .select(
        col("doc_id"),
        expr("""
          CASE WHEN spdx != '' THEN 'spdx'
               WHEN cc != '' THEN 'cc'
               WHEN html LIKE '%All Rights Reserved%' THEN 'arr'
               ELSE 'none' END""").as("license_class"),
        expr("CASE WHEN spdx != '' THEN spdx ELSE cc END")
          .as("license_ref"),
        expr("CASE WHEN robots_meta LIKE '%noai%' THEN 1 ELSE 0 END")
          .cast("long").as("noai"),
        expr("CASE WHEN robots_meta LIKE '%noindex%' THEN 1 ELSE 0 END")
          .cast("long").as("noindex"))
      .withColumn("trainable", expr(
        "CASE WHEN noai = 1 OR license_class = 'arr' THEN 0 ELSE 1 END")
        .cast("long"))

  private val opLicense = Op(
    "license_detect",
    (s, dir) => licenseDetect(withSignals(Html.withHtml(docs(s, dir)))),
    Some(s"""
      WITH ${Html.htmlCte},
      $signalsCte,
      det AS (
        SELECT doc_id, html,
          regexp_extract(html,
            'SPDX-License-Identifier: ([A-Za-z0-9.+-]+)', 1) AS spdx,
          regexp_extract(html, 'CC BY[-A-Z]* [0-9][0-9.]*', 0) AS cc,
          regexp_extract(html,
            '<meta name="robots" content="([^"]*)"', 1) AS robots_meta
        FROM sigs),
      cls AS (
        SELECT doc_id,
          CASE WHEN spdx != '' THEN 'spdx'
               WHEN cc != '' THEN 'cc'
               WHEN html LIKE '%All Rights Reserved%' THEN 'arr'
               ELSE 'none' END AS license_class,
          CASE WHEN spdx != '' THEN spdx ELSE cc END AS license_ref,
          CAST(CASE WHEN robots_meta LIKE '%noai%' THEN 1 ELSE 0 END
            AS BIGINT) AS noai,
          CAST(CASE WHEN robots_meta LIKE '%noindex%' THEN 1 ELSE 0 END
            AS BIGINT) AS noindex
        FROM det)
      SELECT doc_id, license_class, license_ref, noai, noindex,
        CAST(CASE WHEN noai = 1 OR license_class = 'arr' THEN 0 ELSE 1 END
          AS BIGINT) AS trainable
      FROM cls"""))

  // ---- robots_gate -----------------------------------------------------

  /** Synthetic robots.txt per host plus the per-doc request path
    * (doc_id % 7: 0 → under /private/, 1 → under /tag/, else the
    * normal /doc/ path). chr(10) keeps the newline construction
    * identical across engines (DuckDB string literals take no
    * C-escapes).
    */
  private[graft] def withRobots(d: DataFrame): DataFrame =
    d.withColumn("robots", expr("""
        concat('User-agent: *', chr(10),
          'Disallow: /private/', chr(10),
          'Disallow: /tag/', chr(10),
          'Crawl-delay: ', 1 + length(source) % 5)"""))
      .withColumn("path", expr("""
        CASE cast(doc_id % 7 as int)
          WHEN 0 THEN concat('/private/doc/', doc_id)
          WHEN 1 THEN concat('/tag/', source)
          ELSE concat('/doc/', doc_id)
        END"""))
      .withColumn("host", expr("concat(source, '.example.com')"))

  private val robotsCte = """
    rb AS (
      SELECT doc_id, source,
        'User-agent: *' || chr(10) ||
        'Disallow: /private/' || chr(10) ||
        'Disallow: /tag/' || chr(10) ||
        'Crawl-delay: ' || (1 + length(source) % 5) AS robots,
        CASE CAST(doc_id % 7 AS INT)
          WHEN 0 THEN '/private/doc/' || doc_id
          WHEN 1 THEN '/tag/' || source
          ELSE '/doc/' || doc_id
        END AS path,
        source || '.example.com' AS host
      FROM documents)"""

  /** Parse + gate over a frame carrying (robots, path, host): extract
    * the Disallow prefixes and the crawl delay from the robots TEXT
    * (the parse is real — nothing reads the synthesis constants), then
    * longest-prefix match. The longest-match fold avoids
    * list_reduce-class constructs: max prefix length first, then the
    * unique prefix at that length.
    */
  private[graft] def robotsGate(r: DataFrame): DataFrame =
    r.withColumn("rules", expr(
        "regexp_extract_all(robots, 'Disallow: (\\\\S+)', 1)"))
      .withColumn("hits", expr("filter(rules, p -> startswith(path, p))"))
      .withColumn("matched_rule", expr("""
        CASE WHEN size(hits) = 0 THEN ''
             ELSE element_at(filter(hits,
               p -> length(p) = array_max(transform(hits,
                 x -> length(x)))), 1)
        END"""))
      .select(col("doc_id"), col("host"), col("path"), col("matched_rule"),
        expr("CASE WHEN matched_rule = '' THEN 1 ELSE 0 END").cast("long")
          .as("allowed"),
        expr("cast(regexp_extract(robots, 'Crawl-delay: ([0-9]+)', 1)" +
          " as bigint)").as("crawl_delay"))

  private val opRobots = Op(
    "robots_gate",
    (s, dir) => robotsGate(withRobots(docs(s, dir))),
    Some(s"""
      WITH $robotsCte,
      parsed AS (
        SELECT doc_id, host, path, robots,
          regexp_extract_all(robots, 'Disallow: (\\S+)', 1) AS rules
        FROM rb),
      hit AS (
        SELECT doc_id, host, path, robots,
          list_filter(rules, p -> starts_with(path, p)) AS hits
        FROM parsed),
      m AS (
        SELECT doc_id, host, path, robots,
          CASE WHEN len(hits) = 0 THEN ''
               ELSE list_filter(hits, p -> length(p) =
                 list_max(list_transform(hits, x -> length(x))))[1]
          END AS matched_rule
        FROM hit)
      SELECT doc_id, host, path, matched_rule,
        CAST(CASE WHEN matched_rule = '' THEN 1 ELSE 0 END AS BIGINT)
          AS allowed,
        CAST(regexp_extract(robots, 'Crawl-delay: ([0-9]+)', 1) AS BIGINT)
          AS crawl_delay
      FROM m"""))

  // ---- encoding_audit --------------------------------------------------

  /** Deterministic wire-text corruption (doc_id % 6 picks the injury;
    * 4 and 5 stay clean so the majority of the corpus audits ok).
    * Every injected char is a VISIBLE codepoint or chr(7) -- the
    * constructions must be byte-identical across engines, and
    * invisible literals in source are exactly the corruption class
    * this operator exists to catch.
    */
  private[graft] def withWireText(d: DataFrame): DataFrame =
    d.withColumn("wire", expr("""
        CASE cast(doc_id % 6 as int)
          WHEN 0 THEN concat(text, ' donÃ¢t')
          WHEN 1 THEN concat(text, ' �')
          WHEN 2 THEN concat(text, chr(7))
          WHEN 3 THEN concat('naÃ¯ve ', text)
          ELSE text
        END"""))

  private val wireCte = """
    wires AS (
      SELECT doc_id,
        CASE CAST(doc_id % 6 AS INT)
          WHEN 0 THEN text || ' donÃ¢t'
          WHEN 1 THEN text || ' �'
          WHEN 2 THEN text || chr(7)
          WHEN 3 THEN 'naÃ¯ve ' || text
          ELSE text
        END AS wire
      FROM documents)"""

  /** Per-doc encoding audit over a frame carrying `wire`: mojibake
    * lead chars (Ã/Â -- the UTF-8-read-as-Latin-1 signature:
    * real Latin-1 prose virtually never leads with these), replacement
    * chars, control chars (the \p{Cc} Unicode class -- Java regex and
    * RE2 both support it), and the clean verdict. Pure per-row
    * regexp_count projection -- scan speed at any corpus size; the
    * gate every decoder stage publishes before text enters the
    * pipeline.
    */
  private[graft] def encodingAudit(w: DataFrame): DataFrame =
    w.select(col("doc_id"),
        expr("cast(regexp_count(wire, '[ÃÂ]') as bigint)")
          .as("mojibake_hits"),
        expr("cast(regexp_count(wire, '�') as bigint)")
          .as("repl_chars"),
        expr("cast(regexp_count(wire, '\\\\p{Cc}') as bigint)")
          .as("ctrl_chars"))
      .withColumn("enc_ok", expr(
        "CASE WHEN mojibake_hits + repl_chars + ctrl_chars = 0" +
          " THEN 1 ELSE 0 END").cast("long"))

  private val opEncoding = Op(
    "encoding_audit",
    (s, dir) => encodingAudit(withWireText(docs(s, dir))),
    Some(s"""
      WITH $wireCte,
      audit AS (
        SELECT doc_id,
          CAST(len(regexp_extract_all(wire, '[ÃÂ]')) AS BIGINT)
            AS mojibake_hits,
          CAST(len(regexp_extract_all(wire, '�')) AS BIGINT)
            AS repl_chars,
          CAST(len(regexp_extract_all(wire, '\\p{Cc}')) AS BIGINT)
            AS ctrl_chars
        FROM wires)
      SELECT doc_id, mojibake_hits, repl_chars, ctrl_chars,
        CAST(CASE WHEN mojibake_hits + repl_chars + ctrl_chars = 0
          THEN 1 ELSE 0 END AS BIGINT) AS enc_ok
      FROM audit"""))

  // ---- host_reputation -------------------------------------------------

  /** Thresholds for the host-level flag: a host whose docs average
    * under this diversity, or carry too many near-empty docs, is a
    * blocklist candidate (the RefinedWeb domain-filtering stage).
    */
  val HostMinDiversityPpm = 300000L
  val HostShortPpmMax = 200000L
  val ShortDocChars = 50

  /** Host-level quality aggregation over the canonical URL host +
    * per-doc integer quality signals: exact ppm arithmetic end-to-end
    * (sums first, one integer division at the end), one skinny
    * per-host groupBy — the shape that turns per-doc scores into the
    * domain blocklist candidates a crawl frontier consumes.
    */
  private[graft] def hostReputation(d: DataFrame): DataFrame =
    d.withColumn("host", expr("concat(source, '.example.com')"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("div_ppm", expr(
        "(cast(size(array_distinct(toks)) as bigint) * 1000000)" +
          " div greatest(cast(size(toks) as bigint), 1)"))
      .withColumn("is_short", expr(
        s"CASE WHEN length(text) < $ShortDocChars THEN 1 ELSE 0 END"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(cast(length(text) as bigint))").as("sum_chars"),
        expr("(sum(div_ppm) div count(1))").as("avg_diversity_ppm"),
        expr("(sum(is_short) * 1000000) div count(1)").as("short_ppm"))
      .withColumn("flagged", expr(
        s"CASE WHEN avg_diversity_ppm < $HostMinDiversityPpm" +
          s" OR short_ppm > $HostShortPpmMax THEN 1 ELSE 0 END")
        .cast("long"))

  private val opHostRep = Op(
    "host_reputation",
    (s, dir) => hostReputation(docs(s, dir)),
    Some(s"""
      WITH sig AS (
        SELECT source || '.example.com' AS host,
          CAST(length(text) AS BIGINT) AS n_chars2,
          (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            * 1000000)
            // greatest(CAST(len(string_split(text, ' ')) AS BIGINT), 1)
            AS div_ppm,
          CASE WHEN length(text) < $ShortDocChars THEN 1 ELSE 0 END
            AS is_short
        FROM documents),
      agg AS (
        SELECT host, COUNT(*) AS n_docs,
          CAST(SUM(n_chars2) AS BIGINT) AS sum_chars,
          CAST(SUM(div_ppm) AS BIGINT) // COUNT(*) AS avg_diversity_ppm,
          (CAST(SUM(is_short) AS BIGINT) * 1000000) // COUNT(*)
            AS short_ppm
        FROM sig GROUP BY host)
      SELECT host, n_docs, sum_chars, avg_diversity_ppm, short_ppm,
        CAST(CASE WHEN avg_diversity_ppm < $HostMinDiversityPpm
          OR short_ppm > $HostShortPpmMax THEN 1 ELSE 0 END AS BIGINT)
          AS flagged
      FROM agg"""))

  // ---- crawl_schedule --------------------------------------------------

  /** Politeness scheduler over the robots-gated frontier (r18): each
    * host fetches one URL per crawl-delay tick, so an ALLOWED doc's
    * fetch time is (its rank within the host) × (the host's parsed
    * delay). This is the arithmetic every frontier runs to answer
    * "when does this crawl finish" — the per-host makespan — and why
    * a crawl's wall clock is dominated by its largest host, not its
    * page count. Disallowed docs carry fetch_slot −1 (audit rows, the
    * dedup_embed sentinel convention). One window per host over the
    * skinny gated frame (rank only — text never enters), plus the
    * per-host makespan broadcast back; scale-free: window partitions
    * are per-host URL LISTS (ids + delays, bytes per row), and a
    * 100 TB frontier shards by host anyway.
    */
  private[graft] def crawlSchedule(r: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gated = robotsGate(r)
    val byHost = Window.partitionBy(col("host"))
    val allowed = Window.partitionBy(col("host"), col("allowed"))
      .orderBy(col("doc_id"))
    gated
      .withColumn("rk",
        when(col("allowed") === 1L, row_number().over(allowed))
          .otherwise(lit(0L)).cast("long"))
      .withColumn("fetch_slot", when(col("allowed") === 1L,
        (col("rk") - 1L) * col("crawl_delay")).otherwise(lit(-1L)))
      .withColumn("host_makespan",
        max(col("fetch_slot")).over(byHost))
      .select(col("doc_id"), col("host"), col("allowed"),
        col("fetch_slot"), col("host_makespan"))
  }

  private val opSchedule = Op(
    "crawl_schedule",
    (s, dir) => crawlSchedule(withRobots(docs(s, dir))),
    Some(s"""
      WITH $robotsCte,
      parsed AS (
        SELECT doc_id, host, path, robots,
          regexp_extract_all(robots, 'Disallow: (\\S+)', 1) AS rules
        FROM rb),
      hit AS (
        SELECT doc_id, host, path, robots,
          list_filter(rules, p -> starts_with(path, p)) AS hits
        FROM parsed),
      g AS (
        SELECT doc_id, host,
          CAST(CASE WHEN len(hits) = 0 THEN 1 ELSE 0 END AS BIGINT)
            AS allowed,
          CAST(regexp_extract(robots, 'Crawl-delay: ([0-9]+)', 1)
            AS BIGINT) AS crawl_delay
        FROM hit),
      slotted AS (
        SELECT doc_id, host, allowed,
          CASE WHEN allowed = 1 THEN
            (CAST(ROW_NUMBER() OVER (PARTITION BY host, allowed
              ORDER BY doc_id) AS BIGINT) - 1) * crawl_delay
          ELSE -1 END AS fetch_slot
        FROM g)
      SELECT doc_id, host, allowed, fetch_slot,
        CAST(MAX(fetch_slot) OVER (PARTITION BY host) AS BIGINT)
          AS host_makespan
      FROM slotted"""))

  val ops: Seq[Op] =
    Seq(opUrlCanon, opLicense, opRobots, opEncoding, opHostRep,
      opSchedule)
}
