package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML / WARC text extraction — the step every real crawl pipeline
  * (CCNet, RefinedWeb, Dolma) runs BEFORE any operator downstream of
  * raw crawl bytes can see text: tag stripping, head/script/style
  * removal, entity decoding, jusText-class block-level boilerplate
  * classification (link density + minimum text mass), link/anchor
  * chrome metrics, and WARC record header parsing.
  *
  * The engine's test tables carry clean `text` (the reference's
  * datasets/parse.py also starts from clean text — reference
  * zhuohangu/proactive_map_reduce datasets/parse.py:20), so the raw
  * page is DERIVED: a deterministic synthetic page wraps each
  * document's text (title head with a script whose body contains a
  * literal `<` — the classic naive-tag-strip trap; nav / aside /
  * footer link chrome with HTML entities; the text itself as four
  * quarter-slice paragraphs, one carrying an inline anchor). The
  * construction is replayed verbatim in the DuckDB oracle, so every
  * operator in the family is hash-proven end-to-end — the same
  * discipline as the XXH64 sigCtes replays.
  *
  * Scale shape: every operator here is a NARROW per-row projection
  * (regex + string kernels inside whole-stage codegen) — at 100 TB
  * they run at scan speed; html_metrics / curate_html end in a skinny
  * per-source groupBy (map-side partials, text never shuffles).
  */
object Html {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** jusText-class thresholds: a block is content iff it carries at
    * least MinBlockChars of stripped text AND its anchor-text mass is
    * at most LinkPpmMax of the stripped mass.
    */
  val MinBlockChars = 20
  val LinkPpmMax = 330000L

  /** curate_html quality gate: minimum content (good-block) mass. */
  val CurateMinChars = 40

  // ---- the deterministic synthetic page ------------------------------

  /** Spark side of the page construction over (doc_id, source, text).
    * Single line (no newlines), so whitespace semantics are identical
    * across engines; paragraph quarters come from k = ceil(n/4) token
    * slices.
    */
  private[graft] def withHtml(d: DataFrame): DataFrame =
    d.withColumn("t", split(col("text"), " "))
      .withColumn("k", expr("(size(t) + 3) div 4"))
      .withColumn("html", expr("""
        concat(
          '<html><head><title>doc ', doc_id, ' ', source,
          '</title><style>p{margin:0;}</style><script>var x=1;if(x<2){x=2;}</script></head><body>',
          '<nav><a href="/">home</a> <a href="/tag/', source, '">', source,
          '</a> <a href="/doc/', doc_id, '">permalink</a></nav>',
          '<p>', array_join(slice(t, 1, cast(k as int)), ' '), '</p>',
          '<p>', array_join(slice(t, cast(k + 1 as int), cast(k as int)), ' '),
          ' <a href="/doc/', doc_id + 1, '">related</a></p>',
          '<p>', array_join(slice(t, cast(2*k + 1 as int), cast(k as int)), ' '), '</p>',
          '<p>', array_join(slice(t, cast(3*k + 1 as int), cast(k as int)), ' '), '</p>',
          '<aside>deal of the day <a href="/buy">buy now</a> <a href="/sub">subscribe</a> <a href="/win">win a prize</a></aside>',
          '<footer>&copy; 2026 ', source, ' &amp; co &#183; <a href="/terms">terms</a> <a href="/privacy">privacy</a> <a href="/contact">contact</a></footer>',
          '</body></html>')"""))
      .drop("t", "k")

  /** DuckDB twin of [[withHtml]]: CTE chain producing
    * (doc_id, source, html). COALESCE on every slice join — DuckDB's
    * array_to_string over an empty list is NULL, which would
    * NULL-poison the whole concatenation for docs shorter than four
    * tokens (Spark's array_join returns '').
    */
  private[graft] val htmlCte = """
    toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t,
        (CAST(len(string_split(text, ' ')) AS BIGINT) + 3) // 4 AS k
      FROM documents),
    pages AS (
      SELECT doc_id, source,
        '<html><head><title>doc ' || doc_id || ' ' || source ||
        '</title><style>p{margin:0;}</style><script>var x=1;if(x<2){x=2;}</script></head><body>' ||
        '<nav><a href="/">home</a> <a href="/tag/' || source || '">' || source ||
        '</a> <a href="/doc/' || doc_id || '">permalink</a></nav>' ||
        '<p>' || COALESCE(array_to_string(t[1:k], ' '), '') || '</p>' ||
        '<p>' || COALESCE(array_to_string(t[k+1:2*k], ' '), '') ||
        ' <a href="/doc/' || (doc_id + 1) || '">related</a></p>' ||
        '<p>' || COALESCE(array_to_string(t[2*k+1:3*k], ' '), '') || '</p>' ||
        '<p>' || COALESCE(array_to_string(t[3*k+1:4*k], ' '), '') || '</p>' ||
        '<aside>deal of the day <a href="/buy">buy now</a> <a href="/sub">subscribe</a> <a href="/win">win a prize</a></aside>' ||
        '<footer>&copy; 2026 ' || source || ' &amp; co &#183; <a href="/terms">terms</a> <a href="/privacy">privacy</a> <a href="/contact">contact</a></footer>' ||
        '</body></html>' AS html
      FROM toks)"""

  // ---- the extraction kernel -----------------------------------------

  /** Full-page clean chain as a Spark SQL fragment over expression
    * `c`: drop head (takes title/style/script with it), then any
    * body-level script/style, tags → space (word boundaries survive),
    * entity decode (&amp; LAST so partial decodes can't cascade),
    * space collapse, trim. Pattern strings are the Java↔RE2 common
    * subset ((?s), non-greedy, char classes — no backrefs, no
    * lookaround), shared verbatim with the oracle.
    */
  private def cleanSql(c: String): String = s"""
    trim(regexp_replace(
      replace(replace(replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace($c,
          '(?s)<head>.*?</head>', ' '),
          '(?s)<script[^>]*>.*?</script>', ' '),
          '(?s)<style[^>]*>.*?</style>', ' '),
          '<[^>]+>', ' '),
        '&copy;', '©'), '&#183;', '·'), '&amp;', '&'),
      ' +', ' '))"""

  /** DuckDB twin of [[cleanSql]] (regexp_replace needs the explicit
    * 'g' flag; Spark replaces all matches by default).
    */
  private def cleanSqlDuck(c: String): String = s"""
    trim(regexp_replace(
      replace(replace(replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace($c,
          '(?s)<head>.*?</head>', ' ', 'g'),
          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
          '<[^>]+>', ' ', 'g'),
        '&copy;', '©'), '&#183;', '·'), '&amp;', '&'),
      ' +', ' ', 'g'))"""

  /** Per-doc extraction audit over a frame carrying `html`. */
  private[graft] def extract(h: DataFrame): DataFrame =
    h.withColumn("txt", expr(cleanSql("html")))
      .select(col("doc_id"),
        expr("cast(length(html) as bigint)").as("raw_len"),
        expr("cast(length(txt) as bigint)").as("text_len"),
        expr("(cast(length(txt) as bigint) * 1000000)" +
          " div cast(length(html) as bigint)").as("text_ratio_ppm"),
        md5(col("txt")).as("digest"))

  private val opExtract = Op(
    "html_extract",
    (s, dir) => extract(withHtml(docs(s, dir))),
    Some(s"""
      WITH $htmlCte,
      clean AS (
        SELECT doc_id, html, ${cleanSqlDuck("html")} AS txt FROM pages)
      SELECT doc_id,
        CAST(length(html) AS BIGINT) AS raw_len,
        CAST(length(txt) AS BIGINT) AS text_len,
        (CAST(length(txt) AS BIGINT) * 1000000)
          // CAST(length(html) AS BIGINT) AS text_ratio_ppm,
        md5(txt) AS digest
      FROM clean"""))

  // ---- block-level boilerplate classification -------------------------

  /** Block clean chain (blocks carry no head/script/style). */
  private def blockCleanSql(c: String): String = s"""
    trim(regexp_replace(
      replace(replace(replace(
        regexp_replace($c, '<[^>]+>', ' '),
        '&copy;', '©'), '&#183;', '·'), '&amp;', '&'),
      ' +', ' '))"""

  private def blockCleanDuck(c: String): String = s"""
    trim(regexp_replace(
      replace(replace(replace(
        regexp_replace($c, '<[^>]+>', ' ', 'g'),
        '&copy;', '©'), '&#183;', '·'), '&amp;', '&'),
      ' +', ' ', 'g'))"""

  private val blockPat = "(?s)<(?:p|nav|aside|footer)>(.*?)</(?:p|nav|aside|footer)>"
  private val anchorTextPat = "(?s)<a [^>]*>(.*?)</a>"

  /** Per-doc jusText-class verdict over a frame carrying `html`:
    * blocks = top-level p/nav/aside/footer elements; per block, the
    * stripped text and its anchor-text mass; good = enough text, low
    * link density. One narrow projection — the block array never
    * leaves its row.
    */
  private[graft] def boilerplate(h: DataFrame): DataFrame =
    h.withColumn("bs", expr(s"""
        transform(regexp_extract_all(html, '$blockPat', 1),
          b -> named_struct(
            's', ${blockCleanSql("b")},
            'l', cast(coalesce(length(array_join(
                   regexp_extract_all(b, '$anchorTextPat', 1), '')), 0)
                 as bigint)))"""))
      .withColumn("good", expr(s"""
        filter(bs, x -> length(x.s) >= $MinBlockChars
          AND x.l * 1000000 <= $LinkPpmMax
            * greatest(cast(length(x.s) as bigint), 1))"""))
      .select(col("doc_id"), col("source"),
        expr("cast(size(bs) as bigint)").as("n_blocks"),
        expr("cast(size(good) as bigint)").as("n_good"),
        expr("aggregate(good, cast(0 as bigint)," +
          " (a, x) -> a + length(x.s))").as("kept_chars"),
        expr("aggregate(bs, cast(0 as bigint), (a, x) -> a + length(x.s))" +
          " - aggregate(good, cast(0 as bigint), (a, x) -> a + length(x.s))")
          .as("dropped_chars"),
        expr("md5(array_join(transform(good, x -> x.s), ' '))")
          .as("clean_digest"))

  /** Oracle CTE producing the per-doc boilerplate verdict columns —
    * shared by boilerplate_strip and curate_html.
    */
  private val boilerCte = s"""
    blk AS (
      SELECT doc_id, source,
        list_transform(
          regexp_extract_all(html, '$blockPat', 1),
          b -> {
            's': ${blockCleanDuck("b")},
            'l': CAST(COALESCE(length(array_to_string(
                   regexp_extract_all(b, '$anchorTextPat', 1), '')), 0)
                 AS BIGINT)
          }) AS bs
      FROM pages),
    cls AS (
      SELECT doc_id, source, bs,
        list_filter(bs, x -> length(x.s) >= $MinBlockChars
          AND x.l * 1000000 <= $LinkPpmMax
            * greatest(CAST(length(x.s) AS BIGINT), 1)) AS good
      FROM blk),
    verdict AS (
      SELECT doc_id, source,
        CAST(len(bs) AS BIGINT) AS n_blocks,
        CAST(len(good) AS BIGINT) AS n_good,
        CAST(COALESCE(list_sum(list_transform(good, x -> length(x.s))), 0)
          AS BIGINT) AS kept_chars,
        CAST(COALESCE(list_sum(list_transform(bs, x -> length(x.s))), 0)
          AS BIGINT)
          - CAST(COALESCE(list_sum(list_transform(good, x -> length(x.s))), 0)
          AS BIGINT) AS dropped_chars,
        md5(COALESCE(array_to_string(list_transform(good, x -> x.s), ' '),
          '')) AS clean_digest
      FROM cls)"""

  private val opBoiler = Op(
    "boilerplate_strip",
    (s, dir) => boilerplate(withHtml(docs(s, dir))).drop("source"),
    Some(s"""
      WITH $htmlCte,
      $boilerCte
      SELECT doc_id, n_blocks, n_good, kept_chars, dropped_chars,
        clean_digest
      FROM verdict"""))

  // ---- link/anchor chrome metrics per source ---------------------------

  private[graft] def metrics(h: DataFrame): DataFrame =
    h.withColumn("txt", expr(cleanSql("html")))
      .select(col("source"),
        expr("cast(size(regexp_extract_all(html, '<[^>]+>', 0)) as bigint)")
          .as("tags"),
        expr("cast(size(regexp_extract_all(html, '<a [^>]*>', 0)) as bigint)")
          .as("anchors"),
        expr(s"""cast(coalesce(length(array_join(
          regexp_extract_all(html, '$anchorTextPat', 1), '')), 0)
          as bigint)""").as("anchor_chars"),
        expr("cast(length(txt) as bigint)").as("text_chars"),
        expr("cast(length(regexp_extract(html," +
          " '(?s)<script[^>]*>(.*?)</script>', 1)) as bigint)")
          .as("script_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tags")).as("n_tags"),
        sum(col("anchors")).as("n_anchors"),
        expr("(sum(anchor_chars) * 1000000) div sum(text_chars)")
          .as("anchor_char_ppm"),
        sum(col("script_chars")).as("script_chars"))

  private val opMetrics = Op(
    "html_metrics",
    (s, dir) => metrics(withHtml(docs(s, dir))),
    Some(s"""
      WITH $htmlCte,
      m AS (
        SELECT source,
          CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS tags,
          CAST(len(regexp_extract_all(html, '<a [^>]*>')) AS BIGINT)
            AS anchors,
          CAST(COALESCE(length(array_to_string(
            regexp_extract_all(html, '$anchorTextPat', 1), '')), 0)
            AS BIGINT) AS anchor_chars,
          CAST(length(${cleanSqlDuck("html")}) AS BIGINT) AS text_chars,
          CAST(length(regexp_extract(html,
            '(?s)<script[^>]*>(.*?)</script>', 1)) AS BIGINT) AS script_chars
        FROM pages)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(tags) AS BIGINT) AS n_tags,
        CAST(SUM(anchors) AS BIGINT) AS n_anchors,
        (CAST(SUM(anchor_chars) AS BIGINT) * 1000000)
          // CAST(SUM(text_chars) AS BIGINT) AS anchor_char_ppm,
        CAST(SUM(script_chars) AS BIGINT) AS script_chars
      FROM m GROUP BY source"""))

  // ---- WARC record parse ----------------------------------------------

  /** Wraps each page in a WARC/1.0 response record (CRLF headers,
    * blank line, payload) — the wire shape a crawl ingest actually
    * receives.
    */
  private[graft] def warcRecords(h: DataFrame): DataFrame =
    h.select(concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        "https://crawl.example.com/"),
      col("source"), lit("/"), col("doc_id"),
      lit("\r\nContent-Length: "), length(col("html")),
      lit("\r\n\r\n"), col("html")).as("rec"))

  /** Header parse + integrity check over raw records: version, type,
    * URI host/path, declared vs actual payload length.
    */
  private[graft] def warcParse(w: DataFrame): DataFrame =
    w.select(
        expr("regexp_extract(rec, '^WARC/([0-9.]+)', 1)").as("version"),
        expr("regexp_extract(rec, 'WARC-Type: ([a-z]+)', 1)").as("rec_type"),
        expr("regexp_extract(rec, 'WARC-Target-URI: ([^\\r\\n]+)', 1)")
          .as("uri"),
        expr("cast(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1)" +
          " as bigint)").as("content_length"),
        expr("regexp_extract(rec, '(?s)\\r\\n\\r\\n(.*)$', 1)").as("payload"))
      .select(
        expr("cast(regexp_extract(uri, '/([0-9]+)$', 1) as bigint)")
          .as("doc_id"),
        expr("regexp_extract(uri, '^https://([^/]+)/', 1)").as("host"),
        col("version"), col("rec_type"), col("content_length"),
        expr("cast(length(payload) as bigint)").as("payload_len"),
        expr("cast(case when length(payload) = content_length" +
          " then 1 else 0 end as bigint)").as("len_ok"))

  private val opWarc = Op(
    "warc_parse",
    (s, dir) => warcParse(warcRecords(withHtml(docs(s, dir)))),
    Some(s"""
      WITH $htmlCte,
      recs AS (
        SELECT 'WARC/1.0' || chr(13) || chr(10) ||
          'WARC-Type: response' || chr(13) || chr(10) ||
          'WARC-Target-URI: https://crawl.example.com/' || source || '/'
            || doc_id || chr(13) || chr(10) ||
          'Content-Length: ' || length(html) || chr(13) || chr(10) ||
          chr(13) || chr(10) || html AS rec
        FROM pages),
      hdr AS (
        SELECT
          regexp_extract(rec, '^WARC/([0-9.]+)', 1) AS version,
          regexp_extract(rec, 'WARC-Type: ([a-z]+)', 1) AS rec_type,
          regexp_extract(rec, 'WARC-Target-URI: ([^\r\n]+)', 1) AS uri,
          CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS BIGINT)
            AS content_length,
          regexp_extract(rec, '(?s)\r\n\r\n(.*)$$', 1) AS payload
        FROM recs)
      SELECT
        CAST(regexp_extract(uri, '/([0-9]+)$$', 1) AS BIGINT) AS doc_id,
        regexp_extract(uri, '^https://([^/]+)/', 1) AS host,
        version, rec_type, content_length,
        CAST(length(payload) AS BIGINT) AS payload_len,
        CAST(CASE WHEN length(payload) = content_length THEN 1 ELSE 0 END
          AS BIGINT) AS len_ok
      FROM hdr"""))

  // ---- curate_html: crawl → text → gate → dedup → report ---------------

  /** The crawl-side curate_e2e: extract content blocks (boilerplate
    * dropped), quality-gate on content mass, exact-dedup on the
    * content digest (chrome is already gone, so byte-equal texts
    * collapse ACROSS sources), report per source.
    */
  private[graft] def curateHtml(h: DataFrame): DataFrame =
    boilerplate(h)
      .withColumn("kept",
        (col("kept_chars") >= CurateMinChars).cast("int"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        sum(col("kept")).cast("long").as("n_kept"),
        countDistinct(when(col("kept") === 1, col("clean_digest")))
          .as("n_unique"))

  private val opCurateHtml = Op(
    "curate_html",
    (s, dir) => curateHtml(withHtml(docs(s, dir))),
    Some(s"""
      WITH $htmlCte,
      $boilerCte
      SELECT source, COUNT(*) AS n_raw,
        CAST(SUM(CASE WHEN kept_chars >= $CurateMinChars THEN 1 ELSE 0 END)
          AS BIGINT) AS n_kept,
        COUNT(DISTINCT CASE WHEN kept_chars >= $CurateMinChars
          THEN clean_digest END) AS n_unique
      FROM verdict GROUP BY source"""))

  // ---- html_tables: structured table extraction --------------------

  /** html_tables — `<table>` markup flattened into positional cell
    * rows, the extraction a structured-data / RAG pipeline runs where
    * the prose path runs [[opExtract]]: tables are the one block
    * class where STRIPPING tags destroys the signal (cell adjacency
    * IS the semantics), so they extract to (row, col, cell) triples
    * instead. The page variant appends a deterministic table to the
    * standard synthetic page: one `<th>` header row plus 1 +
    * doc_id % 3 data rows, two columns, cells drawn from the doc's
    * token stream (row i col j = token 2·i + j, '' when the doc is
    * short) — construction replayed verbatim in the oracle, so the
    * op is hash-proven like the rest of the family. Extraction is
    * two nested regexp_extract_all passes (rows `<tr>…</tr>`, then
    * cells `<t[dh]>…</t[dh]>` — (?s) non-greedy, the Java↔RE2 common
    * subset) with positional indices from posexplode (Spark) /
    * generate_series indexing (DuckDB, the ngram_lm move).
    *
    * Scale shape: per-row regex + a fan-out bounded by the cell
    * count per page (≤ 8 here; bounded by page size in general) —
    * no shuffle, scan speed at 100 TB; output is the flattened cell
    * frame downstream schema inference / table-QA prep consumes.
    */
  private[graft] def withTablePage(d: DataFrame): DataFrame =
    withHtml(d)
      .withColumn("t", split(col("text"), " "))
      .withColumn("nrows", expr("1 + cast(doc_id % 3 AS int)"))
      .withColumn("tbl", expr("""
        concat(
          '<table><tr><th>key</th><th>value</th></tr>',
          array_join(transform(sequence(1, nrows), i -> concat(
            '<tr><td>', coalesce(try_element_at(t, cast(2*i AS int)), ''),
            '</td><td>',
            coalesce(try_element_at(t, cast(2*i + 1 AS int)), ''),
            '</td></tr>')), ''),
          '</table>')"""))
      .withColumn("html",
        expr("replace(html, '</body>', concat(tbl, '</body>'))"))
      .drop("t", "nrows", "tbl")

  private val tablePageCte = htmlCte + """,
    tdocs AS (
      SELECT p.doc_id, p.source, p.html, t.t,
        1 + CAST(p.doc_id % 3 AS INT) AS nrows
      FROM pages p JOIN toks t USING (doc_id)),
    tpages AS (
      SELECT doc_id, source,
        replace(html, '</body>',
          '<table><tr><th>key</th><th>value</th></tr>' ||
          COALESCE(list_aggregate(list_transform(
            generate_series(1, nrows), i ->
              '<tr><td>' || COALESCE(t[2*i], '') ||
              '</td><td>' || COALESCE(t[2*i + 1], '') ||
              '</td></tr>'), 'string_agg', ''), '') ||
          '</table></body>') AS html
      FROM tdocs)"""

  private val TrRe = "(?s)<tr>(.*?)</tr>"
  private val CellRe = "(?s)<t[dh]>(.*?)</t[dh]>"

  /** Flattened cells over a frame carrying (doc_id, html) — factored
    * so the spec drives a hand-authored multi-table page through it.
    */
  private[graft] def htmlTables(pages: DataFrame): DataFrame =
    pages
      .select(col("doc_id"),
        posexplode(expr(s"regexp_extract_all(html, '$TrRe', 1)"))
          .as(Seq("row_idx", "tr")))
      .withColumn("is_header",
        when(col("tr").contains("<th>"), 1L).otherwise(0L))
      .select(col("doc_id"), col("row_idx").cast("long").as("row_idx"),
        col("is_header"),
        posexplode(expr(s"regexp_extract_all(tr, '$CellRe', 1)"))
          .as(Seq("col_idx", "cell")))
      .select(col("doc_id"), col("row_idx"),
        col("col_idx").cast("long").as("col_idx"), col("is_header"),
        col("cell"))

  private val opTables = Op(
    "html_tables",
    (s, dir) => htmlTables(withTablePage(docs(s, dir))),
    Some(s"""
      WITH $tablePageCte,
      trs AS (
        SELECT doc_id,
          regexp_extract_all(html, '$TrRe', 1) AS rows_
        FROM tpages),
      rows2 AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS row_idx, rows_[i] AS tr
        FROM trs, UNNEST(generate_series(1, len(rows_))) AS u(i)),
      cells AS (
        SELECT doc_id, row_idx,
          CAST(CASE WHEN tr LIKE '%<th>%' THEN 1 ELSE 0 END AS BIGINT)
            AS is_header,
          regexp_extract_all(tr, '$CellRe', 1) AS cs
        FROM rows2)
      SELECT doc_id, row_idx, CAST(j - 1 AS BIGINT) AS col_idx,
        is_header, cs[j] AS cell
      FROM cells, UNNEST(generate_series(1, len(cs))) AS v(j)"""))

  // ---- anchor_text: the inbound link-text corpus --------------------

  /** anchor_text — inbound anchor-text aggregation per target page,
    * the link-graph TEXT signal (anchor text of inbound links
    * describes the target better than the target describes itself —
    * the classic web-IR observation behind the ORCAS / MS MARCO
    * anchor corpora and every "anchor text as weak query" training
    * set): all `<a href>` pairs extract per page (one regex pass for
    * whole tags, then href / text by capture group — Java↔RE2 common
    * subset), doc-targeted hrefs parse their target id, and the
    * skinny (target, source-doc, anchor) stream folds per target into
    * inbound counts, distinct linkers, self-link count, and the
    * sorted-distinct anchor-text list (array_sort after collect so
    * the row is deterministic under any aggregation order). On the
    * synthetic pages every doc receives "permalink" from itself and
    * "related" from its predecessor; the last doc's successor target
    * has no page and simply aggregates one inbound row — extraction
    * reports the graph as linked, not as materialized.
    *
    * Scale shape: per-page regex (scan speed) emitting a SKINNY
    * (target, src, anchor) frame — the page body never shuffles; ONE
    * groupBy on target, which is what inbound aggregation
    * fundamentally requires (the link graph shards by target host at
    * 100 TB; anchor strings are bounded by tag length).
    */
  private val ATagRe = "<a href=\"[^\"]*\">[^<]*</a>"
  private val AHrefRe = "<a href=\"([^\"]*)\">([^<]*)</a>"

  /** Inbound aggregation over a frame carrying (doc_id, html) —
    * factored so the spec drives a hand-authored link mesh.
    */
  private[graft] def anchorText(pages: DataFrame): DataFrame =
    pages
      .select(col("doc_id").as("src"),
        explode(expr(s"""regexp_extract_all(html, '$ATagRe', 0)"""))
          .as("tag"))
      .select(col("src"),
        expr(s"""regexp_extract(tag, '$AHrefRe', 1)""").as("href"),
        expr(s"""regexp_extract(tag, '$AHrefRe', 2)""").as("anchor"))
      .where(col("href").rlike("^/doc/[0-9]+$"))
      .withColumn("target", expr("CAST(substring(href, 6) AS BIGINT)"))
      .groupBy(col("target"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("src")).as("n_linkers"),
        sum(when(col("src") === col("target"), 1L).otherwise(0L))
          .as("n_self"),
        array_join(array_sort(collect_set(col("anchor"))), "|")
          .as("anchors"))

  private val opAnchorText = Op(
    "anchor_text",
    (s, dir) => anchorText(withHtml(docs(s, dir))),
    Some(s"""
      WITH $htmlCte,
      tags AS (
        SELECT doc_id AS src,
          UNNEST(regexp_extract_all(html, '$ATagRe')) AS tag
        FROM pages),
      links AS (
        SELECT src,
          regexp_extract(tag, '$AHrefRe', 1) AS href,
          regexp_extract(tag, '$AHrefRe', 2) AS anchor
        FROM tags),
      doclinks AS (
        SELECT src, CAST(substring(href, 6) AS BIGINT) AS target, anchor
        FROM links WHERE regexp_matches(href, '^/doc/[0-9]+$$'))
      SELECT target,
        CAST(COUNT(*) AS BIGINT) AS n_links,
        CAST(COUNT(DISTINCT src) AS BIGINT) AS n_linkers,
        CAST(SUM(CASE WHEN src = target THEN 1 ELSE 0 END) AS BIGINT)
          AS n_self,
        array_to_string(list_sort(list_distinct(list(anchor))), '|')
          AS anchors
      FROM doclinks GROUP BY target"""))

  val ops: Seq[Op] =
    Seq(opExtract, opBoiler, opMetrics, opWarc, opCurateHtml, opTables,
      opAnchorText)
}
