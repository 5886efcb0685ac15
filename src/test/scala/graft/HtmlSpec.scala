package graft

import graft.operators.Html
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String, source: String = "srcX") =
    (id, text, "en", source, text.length.toLong)

  private def frame(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private val longText = (1 to 40).map(i => s"word$i").mkString(" ")

  test("html_extract: script body with a literal '<' never leaks, head/title dropped, entities decoded") {
    val h = Html.withHtml(frame(doc(7L, longText)))
    val txt = h.withColumn("txt",
      expr("html")).select(col("html")).as[String].head()
    assert(txt.contains("<script>var x=1;if(x<2){x=2;}</script>"),
      "page must carry the naive-strip trap")
    // reproduce the clean chain via the public op output: the digest of
    // a hand-built expectation must match
    val out = Html.extract(h).collect().head
    val expected = "home srcX permalink " +
      (1 to 10).map(i => s"word$i").mkString(" ") + " " +
      (11 to 20).map(i => s"word$i").mkString(" ") + " related " +
      (21 to 30).map(i => s"word$i").mkString(" ") + " " +
      (31 to 40).map(i => s"word$i").mkString(" ") +
      " deal of the day buy now subscribe win a prize " +
      "© 2026 srcX & co · terms privacy contact"
    assert(out.getAs[Long]("text_len") == expected.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.getAs[String]("digest") == md,
      "extracted text must equal the hand-built expectation byte-for-byte")
    assert(!expected.contains("var x") && !expected.contains("doc 7"),
      "script body and title must not survive extraction")
  }

  test("boilerplate_strip: nav/aside/footer classified boilerplate, long paragraphs kept, inline-anchor paragraph survives") {
    val out = Html.boilerplate(Html.withHtml(frame(doc(1L, longText))))
      .collect().head
    assert(out.getAs[Long]("n_blocks") == 7L)
    // good = the four paragraph quarters (each 10 words ≥ 20 chars,
    // link mass only in p2's 'related' anchor — far under the ceiling)
    assert(out.getAs[Long]("n_good") == 4L)
    assert(out.getAs[Long]("kept_chars") > 0L)
    assert(out.getAs[Long]("dropped_chars") > 0L)
  }

  test("boilerplate_strip: a one-word doc keeps nothing and digests the empty string") {
    val out = Html.boilerplate(Html.withHtml(frame(doc(2L, "hello"))))
      .collect().head
    assert(out.getAs[Long]("n_blocks") == 7L)
    assert(out.getAs[Long]("n_good") == 0L,
      "5-char paragraph is under MinBlockChars; chrome is link-dense")
    assert(out.getAs[Long]("kept_chars") == 0L)
    assert(out.getAs[String]("clean_digest") ==
      "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("boilerplate_strip: a link-flood paragraph is classified boilerplate even when long") {
    // hand-built page exercising the link-density arm independent of
    // the generator: one legit paragraph, one long anchor-only one
    val page = Seq((9L, "srcY",
      "<p>" + ("genuine content words here repeated " * 3).trim + "</p>" +
        "<p><a href=\"/a\">click</a> <a href=\"/b\">here</a> " +
        "<a href=\"/c\">now please subscribe today</a></p>"))
      .toDF("doc_id", "source", "html")
    val out = Html.boilerplate(page).collect().head
    assert(out.getAs[Long]("n_blocks") == 2L)
    assert(out.getAs[Long]("n_good") == 1L,
      "anchor-dominated block must be dropped by the ppm ceiling")
  }

  test("warc_parse: headers parse back, declared length matches payload, ids round-trip") {
    val d = frame(doc(3L, longText, "srcA"), doc(44L, "tiny", "srcB"))
    val out = Html.warcParse(Html.warcRecords(Html.withHtml(d)))
      .collect().map(r => (r.getAs[Long]("doc_id"), r)).toMap
    assert(out.keySet == Set(3L, 44L))
    out.values.foreach { r =>
      assert(r.getAs[String]("version") == "1.0")
      assert(r.getAs[String]("rec_type") == "response")
      assert(r.getAs[String]("host") == "crawl.example.com")
      assert(r.getAs[Long]("len_ok") == 1L,
        "Content-Length must equal the actual payload length")
      assert(r.getAs[Long]("content_length") ==
        r.getAs[Long]("payload_len"))
    }
  }

  test("warc_parse: a truncated payload fails the length check") {
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://crawl.example.com/srcZ/5\r\n" +
      "Content-Length: 100\r\n\r\nshort payload"
    val out = Html.warcParse(Seq(rec).toDF("rec")).collect().head
    assert(out.getAs[Long]("len_ok") == 0L)
    assert(out.getAs[Long]("content_length") == 100L)
    assert(out.getAs[Long]("payload_len") == 13L)
  }

  test("curate_html: byte-equal texts dedup ACROSS sources because chrome is stripped before the digest") {
    val d = frame(
      doc(1L, longText, "srcA"),
      doc(2L, longText, "srcB"), // same text, different source+ids
      doc(3L, "other " + longText, "srcA"),
      doc(4L, "hi", "srcB")) // fails the quality gate
    val out = Html.curateHtml(Html.withHtml(d)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_raw"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_unique"))).toMap
    assert(out("srcA") == ((2L, 2L, 2L)))
    assert(out("srcB") == ((2L, 1L, 1L)))
    // cross-source: the union of kept digests is 2, not 3 — doc 2's
    // content collapses onto doc 1's despite differing ids/sources
    val digests = Html.boilerplate(Html.withHtml(d))
      .where(col("kept_chars") >= Html.CurateMinChars)
      .select("clean_digest").as[String].collect().toSet
    assert(digests.size == 2)
  }

  test("corpus invariants at sf0.001: every record parses whole, extraction strictly shrinks, blocks always total 7") {
    val q = SparkEntry.queries
    val warc = q("warc_parse")(spark, sfDir).collect()
    assert(warc.nonEmpty)
    warc.foreach(r => assert(r.getAs[Long]("len_ok") == 1L))
    val ex = q("html_extract")(spark, sfDir).collect()
    ex.foreach { r =>
      assert(r.getAs[Long]("text_len") < r.getAs[Long]("raw_len"))
      assert(r.getAs[Long]("text_ratio_ppm") < 1000000L)
    }
    val bp = q("boilerplate_strip")(spark, sfDir).collect()
    bp.foreach(r => assert(r.getAs[Long]("n_blocks") == 7L))
  }

  test("html_tables: hand page — positional cells, header flags, multiple tables, empty cells") {
    // two tables on one page: extraction must keep row/col positions,
    // flag the th row, and carry empty cells (a td with no text is a
    // REAL cell — dropping it would shift the column grid)
    val page = Seq((1L,
      "<html><body><p>prose</p>" +
        "<table><tr><th>k</th><th>v</th></tr>" +
        "<tr><td>a</td><td>b</td></tr></table>" +
        "<table><tr><td></td><td>solo</td></tr></table>" +
        "</body></html>")).toDF("doc_id", "html")
    val out = Html.htmlTables(page).collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getString(4))).toMap
    assert(out.size == 6)
    assert(out((0L, 0L)) == (1L, "k"))
    assert(out((0L, 1L)) == (1L, "v"))
    assert(out((1L, 0L)) == (0L, "a"))
    assert(out((1L, 1L)) == (0L, "b"))
    // second table continues the page's row numbering (row_idx is the
    // page-level <tr> index — table grouping is the <th> boundary)
    assert(out((2L, 0L)) == (0L, ""))
    assert(out((2L, 1L)) == (0L, "solo"))
  }

  test("html_tables corpus invariants: the synthetic table tiles exactly, short docs pad with empty cells") {
    val rows = SparkEntry.queries("html_tables")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (id, cells) =>
      // 1 header row + 1 + id % 3 data rows, two columns each
      val nRows = 2 + id % 3
      assert(cells.length == 2 * nRows, s"doc $id")
      assert(cells.count(_._4 == 1L) == 2, s"doc $id header cells")
      // header is the first row and reads key/value
      assert(cells.filter(_._2 == 0L).sortBy(_._3).map(_._5).toSeq ==
        Seq("key", "value"), s"doc $id")
      // the column grid is dense: every (row, col) in range exactly once
      assert(cells.map(c => (c._2, c._3)).toSet ==
        (0L until nRows).flatMap(r => Seq((r, 0L), (r, 1L))).toSet,
        s"doc $id grid")
    }
  }

  test("html_tables totality: malformed markup never throws — unclosed rows drop, attributes break the cell regex, text survives") {
    // real crawl tables are dirty; extraction must stay TOTAL and
    // deterministic: an unclosed <tr> has no matching close and
    // yields no row (non-greedy needs the close tag); <td> with
    // attributes doesn't match the plain-cell regex (the synthetic
    // contract is attribute-free cells — dirty cells drop rather
    // than corrupt the grid); nested tables flatten in document
    // order of their <tr> closes
    val dirty = Seq(
      (1L, "<table><tr><td>ok</td></tr><tr><td>lost"),      // unclosed
      (2L, "<table><tr><td class=\"x\">attr</td><td>plain</td></tr>"),
      (3L, "<tr><td>a</td><td><table><tr><td>inner</td></tr></table></td></tr>"),
      (4L, "no tables at all"))
      .toDF("doc_id", "html")
    val out = Html.htmlTables(dirty).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(4)))
    // doc 1: only the closed row survives
    assert(out.filter(_._1 == 1L).map(_._4).toSeq == Seq("ok"))
    // doc 2: the attribute cell drops, the plain cell keeps its col
    // slot RELATIVE to surviving cells (col_idx is per surviving set)
    assert(out.filter(_._1 == 2L).map(_._4).toSeq == Seq("plain"))
    // doc 3: nesting degrades, never corrupts — the outer row closes
    // at the INNER </tr> (non-greedy), its clean first cell parses,
    // and the nested cell's text survives inside the second capture
    // (the flat-grid contract: nested tables are out of contract,
    // their text is not lost)
    val d3 = out.filter(_._1 == 3L).map(_._4)
    assert(d3.contains("a") && d3.exists(_.contains("inner")))
    // doc 4: zero rows, zero throws
    assert(!out.exists(_._1 == 4L))
  }

  test("anchor_text: hand mesh — dup anchors dedup, self-links counted, non-doc hrefs filtered") {
    val pages = Seq(
      (1L, "<html><body><a href=\"/doc/2\">two</a></body></html>"),
      (2L, "<html><body><a href=\"/doc/2\">self</a>" +
        "<a href=\"/other\">x</a><a href=\"/doc/abc\">bad</a></body></html>"),
      (3L, "<html><body><a href=\"/doc/2\">two</a></body></html>"))
      .toDF("doc_id", "html")
    val out = Html.anchorText(pages).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    // only /doc/<digits> targets survive; "two" appears twice but the
    // anchor list is distinct + sorted
    assert(out.keySet == Set(2L))
    assert(out(2L) == (3L, 3L, 1L, "self|two"))
  }

  test("anchor_text corpus invariants: the synthetic link mesh — self permalink + predecessor related") {
    val nDocs = graft.Tables(spark, sfDir, "documents").count()
    val rows = SparkEntry.queries("anchor_text")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    // every doc receives links, plus the one ghost successor target
    assert(rows.size.toLong == nDocs + 1)
    // interior targets: permalink from self + related from predecessor
    assert(rows(1L) == (2L, 2L, 1L, "permalink|related"))
    // doc 0 has no predecessor; the ghost target has no page (and so
    // no self link) — extraction reports the graph as LINKED
    assert(rows(0L) == (1L, 1L, 1L, "permalink"))
    assert(rows(nDocs) == (1L, 1L, 0L, "related"))
  }
}
