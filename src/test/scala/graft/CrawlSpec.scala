package graft

import graft.operators.Crawl
import org.apache.spark.sql.functions._

class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private def doc(id: Long, source: String = "srcX") =
    (id, "some text", "en", source, 9L)

  // ---- url_canon -------------------------------------------------------

  test("url_canon: all tracking-only variants collapse to the bare core; a real param survives in its own group") {
    // ids 8..11 share cores 4 and 5; variants by id%4: 8→v0, 9→v1
    // (both core 4), 10→v2 (real param), 11→v3 (both core 5 with v3
    // alone... id 10 div 2 = 5, id 11 div 2 = 5 — v2 escapes the
    // group, so core-5's group is v3 alone)
    val out = Crawl.urlCanon(frame(doc(8L), doc(9L), doc(10L), doc(11L)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("canon"), r.getAs[Long]("group_size"),
          r.getAs[Long]("dup_rank"))).toMap
    val core4 = "https://srcx.example.com/doc/4"
    val core5 = "https://srcx.example.com/doc/5"
    assert(out(8L)._1 == core4 && out(9L)._1 == core4,
      s"v0 and v1 (www/port/case/utm) must both canonicalize to $core4: $out")
    assert(out(8L)._2 == 2L && out(9L)._2 == 2L)
    assert(Set(out(8L)._3, out(9L)._3) == Set(1L, 2L),
      "dup_rank must enumerate the group by doc_id")
    assert(out(10L)._1 == core5 + "?page=2",
      s"the real page param must SURVIVE canonicalization: ${out(10L)}")
    assert(out(10L)._2 == 1L, "a surviving param is a different page")
    assert(out(11L)._1 == core5,
      "trailing slash + ref/utm params must strip to the bare core")
  }

  test("url_canon: host is lowercased with www. and :443 stripped") {
    val out = Crawl.urlCanon(frame(doc(1L, "MiXeD"))).collect().head
    assert(out.getAs[String]("host") == "mixed.example.com")
    assert(out.getAs[String]("canon")
      .startsWith("https://mixed.example.com/"))
  }

  // ---- license_detect --------------------------------------------------

  private def pageFrame(rows: (Long, String)*) =
    rows.toDF("doc_id", "html")

  test("license_detect: generic patterns — SPDX wins over CC, arr kills trainable, noai kills trainable, none stays trainable") {
    val out = Crawl.licenseDetect(pageFrame(
        1L -> ("<html><body>code here <!-- SPDX-License-Identifier: " +
          "Apache-2.0 --> Licensed under CC BY 4.0</body></html>"),
        2L -> "<html><body>Licensed under CC BY-NC 3.0</body></html>",
        3L -> "<html><body>All Rights Reserved</body></html>",
        4L -> ("""<html><head><meta name="robots" content="noai">""" +
          "</head><body>plain</body></html>"),
        5L -> "<html><body>no signals at all</body></html>"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("license_class"), r.getAs[String]("license_ref"),
          r.getAs[Long]("noai"), r.getAs[Long]("trainable"))).toMap
    assert(out(1L) == (("spdx", "Apache-2.0", 0L, 1L)),
      s"SPDX must win over a co-present CC statement: ${out(1L)}")
    assert(out(2L) == (("cc", "CC BY-NC 3.0", 0L, 1L)))
    assert(out(3L) == (("arr", "", 0L, 0L)),
      "all-rights-reserved must flip trainable off")
    assert(out(4L) == (("none", "", 1L, 0L)),
      "a noai robots directive must flip trainable off")
    assert(out(5L) == (("none", "", 0L, 1L)),
      "unknown license stays trainable under the documented policy")
  }

  test("license_detect: the synthetic signal cycle lands each class where doc_id % 5 says") {
    val out = Crawl.licenseDetect(Crawl.withSignals(
        graft.operators.Html.withHtml(
          frame((0L to 4L).map(i => doc(i)): _*))))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("license_class")).toMap
    assert(out == Map(0L -> "none", 1L -> "cc", 2L -> "spdx",
      3L -> "arr", 4L -> "none"))
  }

  // ---- robots_gate -----------------------------------------------------

  private def robotsFrame(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "robots", "path", "host")

  test("robots_gate: longest prefix wins when rules nest; unmatched path is allowed; delay parsed from the text") {
    val robots = "User-agent: *\nDisallow: /a/\nDisallow: /a/b/\n" +
      "Crawl-delay: 7"
    val out = Crawl.robotsGate(robotsFrame(
        (1L, robots, "/a/b/c", "h"),
        (2L, robots, "/a/x", "h"),
        (3L, robots, "/open/doc", "h")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("matched_rule"), r.getAs[Long]("allowed"),
          r.getAs[Long]("crawl_delay"))).toMap
    assert(out(1L) == (("/a/b/", 0L, 7L)),
      s"nested rules must resolve to the LONGEST matching prefix: ${out(1L)}")
    assert(out(2L) == (("/a/", 0L, 7L)))
    assert(out(3L) == (("", 1L, 7L)))
  }

  test("robots_gate: the synthetic corpus routes private/tag paths to disallow and doc paths to allow") {
    val out = Crawl.robotsGate(Crawl.withRobots(
        frame((0L to 6L).map(i => doc(i)): _*)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("allowed")).toMap
    assert(out(0L) == 0L, "/private/ path must gate")
    assert(out(1L) == 0L, "/tag/ path must gate")
    (2L to 6L).foreach(i => assert(out(i) == 1L, s"doc path $i allowed"))
  }

  // ---- encoding_audit --------------------------------------------------

  test("encoding_audit: mojibake lead chars, replacement chars and control chars each count; clean text audits ok") {
    val out = Crawl.encodingAudit(Seq(
        (1L, "plain ascii words"),
        (2L, "donÃ¢t naÃ¯ve"),
        (3L, "bad �� decode"),
        (4L, "bell\u0007 and esc\u001b here"))
      .toDF("doc_id", "wire"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("mojibake_hits"), r.getAs[Long]("repl_chars"),
          r.getAs[Long]("ctrl_chars"), r.getAs[Long]("enc_ok"))).toMap
    assert(out(1L) == ((0L, 0L, 0L, 1L)))
    assert(out(2L) == ((2L, 0L, 0L, 0L)),
      s"two UTF-8-as-Latin-1 lead chars must count: ${out(2L)}")
    assert(out(3L) == ((0L, 2L, 0L, 0L)))
    assert(out(4L) == ((0L, 0L, 2L, 0L)),
      s"BEL and ESC are both control chars: ${out(4L)}")
  }

  test("encoding_audit: the synthetic injury cycle lands each defect where doc_id % 6 says") {
    val out = Crawl.encodingAudit(Crawl.withWireText(
        frame((0L to 5L).map(i => doc(i)): _*)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("enc_ok")).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L))
  }

  // ---- host_reputation -------------------------------------------------

  test("host_reputation: a low-diversity host flags, a clean host does not; ppm arithmetic is exact") {
    val spam = "buy buy buy buy buy buy buy buy buy buy" // div 1/10
    val clean = "ten entirely distinct tokens make this document diverse enough today"
    val out = Crawl.hostReputation(frame(
        (1L, spam, "en", "spamco", spam.length.toLong),
        (2L, spam, "en", "spamco", spam.length.toLong),
        (3L, clean, "en", "goodco", clean.length.toLong),
        (4L, clean + " extra tail", "en", "goodco", clean.length + 11L)))
      .collect().map(r => r.getAs[String]("host") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("avg_diversity_ppm"),
          r.getAs[Long]("short_ppm"), r.getAs[Long]("flagged"))).toMap
    assert(out("spamco.example.com")._2 == 100000L,
      "1 distinct of 10 tokens = exactly 100000 ppm")
    assert(out("spamco.example.com")._4 == 1L, "spam host must flag")
    assert(out("spamco.example.com")._3 == 1000000L,
      "39-char docs are short: short_ppm = 1e6 exactly")
    assert(out("goodco.example.com")._4 == 0L, "clean host must not flag")
    assert(out("goodco.example.com")._1 == 2L)
  }

  test("robots_gate: crawl delay derives from the host's source length") {
    val out = Crawl.robotsGate(Crawl.withRobots(
        frame(doc(2L, "ab"), doc(3L, "abcdef"))))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("crawl_delay")).toMap
    assert(out(2L) == 1L + 2 % 5)
    assert(out(3L) == 1L + 6 % 5)
  }

  test("crawl_schedule: per-host slots tick by the parsed delay; disallowed rows carry the -1 sentinel; makespan is the host's last slot") {
    // srcA (len 4 -> delay 5): docs 2,3,4 allowed (0%7..: 2,3,4 -> /doc),
    // doc 0 -> /private (disallowed), doc 1 -> /tag (disallowed)
    val out = Crawl.crawlSchedule(Crawl.withRobots(
        frame((0L to 4L).map(i => doc(i, "srcA")): _*)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("allowed"), r.getAs[Long]("fetch_slot"),
          r.getAs[Long]("host_makespan"))).toMap
    val d = 1L + 4 % 5 // srcA delay
    assert(out(0L) == ((0L, -1L, 2 * d)))
    assert(out(1L) == ((0L, -1L, 2 * d)))
    assert(out(2L) == ((1L, 0L, 2 * d)), "first allowed fetches at slot 0")
    assert(out(3L) == ((1L, d, 2 * d)))
    assert(out(4L) == ((1L, 2 * d, 2 * d)),
      "slots tick by the host's parsed crawl delay")
  }
}
