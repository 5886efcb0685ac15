package graft

import graft.sources.{Corpus, Jsonl}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-src")
    val p = dir.resolve(name)
    Files.writeString(p, lines.mkString("\n"))
    p.toString
  }

  test("readSectioned: 10-line sections, last partial kept (parse.py semantics)") {
    val path = writeLines("c.en", (0 until 25).map(i => s"line$i"))
    val out = Corpus.readSectioned(spark, path).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_lines")).toSeq == Seq(10L, 10L, 5L))
    assert(out.head.getAs[String]("text").startsWith("line0\nline1"))
    assert(out.last.getAs[String]("text").endsWith("line24"))
  }

  test("splitSentences: reference partition arithmetic (n//steps, last takes rest)") {
    val df = Seq(
      (1L, "Aa bb. Cc dd! Ee ff? Gg hh. Ii jj."), // 5 sentences
      (2L, "One.")                                 // fewer sentences than steps
    ).toDF("doc_id", "text")
    val two = Corpus.splitSentences(df.filter($"doc_id" === 1), 2)
      .orderBy("step").collect().map(_.getAs[String]("part_text")).toSeq
    // ps = 5 // 2 = 2: [s0 s1], [s2 s3 s4]
    assert(two == Seq("Aa bb. Cc dd!", "Ee ff? Gg hh. Ii jj."))
    val three = Corpus.splitSentences(df.filter($"doc_id" === 1), 3)
      .orderBy("step").collect().map(_.getAs[String]("part_text")).toSeq
    // ps = 5 // 3 = 1: [s0], [s1], [s2 s3 s4]
    assert(three == Seq("Aa bb.", "Cc dd!", "Ee ff? Gg hh. Ii jj."))
    // n < steps: ps = 0 -> leading partitions empty, last takes all
    // (doc_prompts[i*0:(i+1)*0] = [] in the reference)
    val short = Corpus.splitSentences(df.filter($"doc_id" === 2), 3)
      .orderBy("step").collect().map(_.getAs[String]("part_text")).toSeq
    assert(short == Seq("", "", "One."))
    // every doc fans out to exactly numSteps rows, no shuffle in plan
    val plan = Corpus.splitSentences(df, 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("readParallel: src/tgt stay aligned per section") {
    val src = writeLines("p.en", (0 until 12).map(i => s"en$i"))
    val tgt = writeLines("p.zh", (0 until 12).map(i => s"zh$i"))
    val out = Corpus.readParallel(spark, src, tgt).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).getAs[String]("src_text") == "en10\nen11")
    assert(out(1).getAs[String]("tgt_text") == "zh10\nzh11")
  }

  test("jsonl roundtrip preserves score-record shape") {
    val dir = Files.createTempDirectory("graft-jsonl").resolve("out").toString
    val df = Seq((1L, 0.5, "ok"), (2L, 0.75, "better"))
      .toDF("doc_id", "f1", "note")
    Jsonl.write(df, dir)
    val back = Jsonl.read(spark, dir)
    assert(back.count() == 2)
    assert(back.agg(sum("f1")).head().getDouble(0) == 1.25)
  }

  test("sectioned corpus feeds the mr pipeline end-to-end") {
    val path = writeLines("c2.en", (0 until 30).map(i => s"tok$i word$i"))
    val docs = Corpus.readSectioned(spark, path)
      .select($"doc_id", regexp_replace($"text", "\n", " ").as("text"))
    val chunks = graft.operators.MapReduceDocs.chunked(docs)
    assert(chunks.count() > 0)
    assert(chunks.groupBy("doc_id").count().count() == 3)
  }

  test("src_csv_robust: malformed rows quarantine whole with evidence; RFC-4180 quoting parses") {
    import graft.sources.Csv
    import org.apache.spark.sql.types._
    val path = writeLines("drop.csv", Seq(
      "id,score,name",
      "1,10,alice",
      "2,notanint,bob",            // bad type → quarantine
      "3,30,\"say \"\"hi\"\", ok\"", // escaped quote + embedded comma
      "4,40"                        // arity drift → quarantine too
    ))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", LongType),
      StructField("name", StringType)))
    val (good, bad) = Csv.split(Csv.readRobust(spark, path, schema))
    val g = good.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2))).toMap
    assert(g(1L) == (10L, "alice"))
    // RFC 4180: "" inside a quoted field is a literal quote, the
    // comma inside the quotes never splits
    assert(g(3L) == (30L, "say \"hi\", ok"))
    assert(g.size == 2)
    // bad-type AND wrong-arity rows quarantine WHOLE with the raw
    // line preserved — arity drift is a schema violation, not a pad
    val b = bad.collect()
      .map(_.getAs[String](Csv.CorruptCol)).sorted.toSeq
    assert(b == Seq("2,notanint,bob", "4,40"))
  }

  test("src_xml_pages: record framing on </page>, first-id anchoring, entity decode, trailer dropped") {
    import graft.sources.Xml
    val dump =
      """<mediawiki><siteinfo><sitename>T</sitename></siteinfo>
        |<page>
        |  <title>Alpha</title>
        |  <ns>0</ns>
        |  <id>10</id>
        |  <revision><id>999</id>
        |    <text bytes="29">AT&amp;T said &lt;hello&gt; &quot;hi&quot;</text>
        |  </revision>
        |</page>
        |<page>
        |  <title>Beta</title>
        |  <ns>0</ns>
        |  <id>11</id>
        |  <redirect title="Alpha" />
        |  <revision><id>1000</id><text>#REDIRECT [[Alpha]]</text></revision>
        |</page>
        |<page>
        |  <title>Category:Things</title>
        |  <ns>14</ns>
        |  <id>12</id>
        |  <revision><id>1001</id><text>cat page</text></revision>
        |</page>
        |</mediawiki>""".stripMargin
    val path = writeLines("dump.xml", Seq(dump))
    val pages = Xml.readPages(spark, path).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toMap
    // the </mediawiki> trailer fragment is framing noise, not a row
    assert(pages.size == 3)
    // page-level id wins over the revision id that follows it
    assert(pages(10L)._1 == "Alpha" && pages(10L)._2 == 0L)
    assert(pages(10L)._3 == 0L)
    // all five predefined entities decode, &amp; decoded last
    assert(pages(10L)._4 == "AT&T said <hello> \"hi\"")
    assert(pages(11L) == ("Beta", 0L, 1L, "#REDIRECT [[Alpha]]"))
    assert(pages(12L)._2 == 14L)
    // the standard article filter: main-namespace non-redirects only
    val arts = Xml.articles(spark, path).collect()
    assert(arts.map(_.getLong(0)).toSeq == Seq(10L))
  }
}
