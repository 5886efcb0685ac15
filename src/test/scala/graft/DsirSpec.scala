package graft

import graft.operators.Dsir
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dsir_select: planted-distribution recovery (docs that look like
  * the curated target slice must outrank docs that don't — the whole
  * point of importance resampling), exact-mode contract (tranche
  * size, rank density, bits_per_token identity), and the sketch
  * mode's bounded disagreement with the exact window.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  /** Target slice (src0..4) speaks "wiki" vocabulary; the raw pool
    * (src5+) is half wiki-like, half spam drawn from a disjoint
    * pool. Deterministic. */
  private def planted(nRaw: Int): DataFrame = {
    val rnd = new scala.util.Random(1414)
    val wiki = (1 to 50).map(i => s"wiki$i")
    val spam = (1 to 50).map(i => s"spam$i")
    def doc(pool: Seq[String]): String =
      (0 until 40 + rnd.nextInt(20))
        .map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
    val target = (0 until 20).map(i =>
      (i.toLong, doc(wiki), s"src${i % 5}"))
    val raw = (0 until nRaw).map { i =>
      val pool = if (i % 2 == 0) wiki else spam
      ((100 + i).toLong, doc(pool), s"src${5 + i % 15}")
    }
    (target ++ raw).toDF("doc_id", "text", "source")
  }

  test("weights: every wiki-like raw doc outranks every spam raw doc") {
    val w = Dsir.weights(planted(40)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("llr_bits").toDouble / r.getAs[Long]("n_toks")))
      .toMap
    assert(w.size == 40) // raw docs only — the target slice is the model
    val wikiLike = w.filter(kv => (kv._1 - 100) % 2 == 0).values
    val spamLike = w.filter(kv => (kv._1 - 100) % 2 == 1).values
    assert(wikiLike.min > spamLike.max,
      s"wiki-like min ${wikiLike.min} vs spam max ${spamLike.max}")
    // wiki tokens carry positive evidence, spam strictly negative
    assert(wikiLike.min > 0.0 && spamLike.max < 0.0)
  }

  test("dsir_select: top-decile tranche, dense ranks, selected docs are target-like") {
    val d = planted(40).localCheckpoint()
    d.createOrReplaceTempView("dsir_fixture")
    import org.apache.spark.sql.expressions.Window
    // replay the op's selection on the fixture frame
    val w = Dsir.weights(d)
    val n = w.agg(count(lit(1)).as("n_raw"))
    val sel = w.crossJoin(broadcast(n))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("llr_bits").desc, col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= expr("(n_raw + 9) DIV 10"))
      .collect()
    assert(sel.length == 4) // ceil(40 / 10)
    assert(sel.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 4L))
    // every selected doc is from the wiki-like half
    assert(sel.forall(r => (r.getAs[Long]("doc_id") - 100) % 2 == 0))
  }

  test("driver query on sf0.001: tranche size and bits_per_token identity") {
    val out = SparkEntry.queries("dsir_select")(spark,
      "/root/testdata/sf0.001").collect()
    val nRaw = Dsir.weights(
      Tables(spark, "/root/testdata/sf0.001", "documents")).count()
    assert(out.length == ((nRaw + 9) / 10).toInt)
    out.foreach { r =>
      val bpt = r.getAs[Long]("llr_bits").toDouble / r.getAs[Long]("n_toks")
      assert(math.abs(r.getAs[Double]("bits_per_token")
        - math.rint(bpt * 1e6) / 1e6) < 1e-12)
    }
  }

  test("sketch mode: the cut lands in the KLL rank band, atoms kept whole") {
    val dir = "/root/testdata/sf0.01"
    val sk = SparkEntry.queries("dsir_select_sketch")(spark, dir)
      .select("doc_id", "llr_bits").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("llr_bits"))
    val all = Dsir.weights(Tables(spark, dir, "documents"))
      .select("doc_id", "llr_bits").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("llr_bits"))
    val n = all.length
    val cut = sk.map(_._2).min // the filter is llr_bits >= cut
    // threshold semantics: EVERYTHING at-or-above the cut is kept
    val expected = all.filter(_._2 >= cut).map(_._1).toSet
    assert(sk.map(_._1).toSet == expected)
    // the cut's normalized rank is within the KLL band (~1.65% at
    // k=200, 99% conf; allow 2x) of the exact 90th percentile:
    // strictly-above-cut docs can't exceed the upper band, and the
    // kept tranche must reach the lower band
    val above = all.count(_._2 > cut)
    val kept = sk.length
    val eps = 0.033
    assert(above <= math.ceil(n * (0.1 + eps)),
      s"$above docs strictly above cut $cut of $n")
    assert(kept >= math.floor(n * (0.1 - eps)),
      s"only $kept kept of $n at cut $cut")
    // and the exact top tranche is inside the sketch tranche up to
    // the boundary atom: every exact-selected doc with weight
    // STRICTLY above the cut is kept
    val exact = SparkEntry.queries("dsir_select")(spark, dir)
      .select("doc_id", "llr_bits").collect()
      .filter(_.getAs[Long]("llr_bits") > cut)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(exact.subsetOf(sk.map(_._1).toSet))
  }

  test("int64 headroom is enforced in code: over-bound counts fail loudly, in-bound pass") {
    def tot(rows: (String, Long, Long)*): Array[org.apache.spark.sql.Row] =
      Dsir.totals(rows.toSeq.toDF("tok", "ct", "cr")).collect()
    // in-bound: normal counts fold to (nt, nr, v)
    val ok = tot(("a", 10L, 3L), ("b", 1L, 4L)).head
    assert(ok.getLong(0) === 11L && ok.getLong(1) === 7L && ok.getLong(2) === 2L)
    // a token hotter than MaxTokenCount would wrap (c+1)*2^40 — refuse
    val e1 = intercept[Exception] {
      tot(("the", Dsir.MaxTokenCount + 1, 0L))
    }
    assert(e1.getMessage.contains("headroom"), e1.getMessage)
    // the raw side is checked too, not just the target side
    val e2 = intercept[Exception] {
      tot(("the", 0L, Dsir.MaxTokenCount + 1))
    }
    assert(e2.getMessage.contains("headroom"), e2.getMessage)
    // N+V past DsirScale would truncate smoothed probs to zero bits:
    // every count individually in-bound, the SUM over the bound
    val nRows = Dsir.DsirScale / Dsir.MaxTokenCount + 2
    val wide = spark.range(nRows).select(
      concat(lit("t"), col("id").cast("string")).as("tok"),
      lit(Dsir.MaxTokenCount).as("ct"), lit(0L).as("cr"))
    val e3 = intercept[Exception] { Dsir.totals(wide).collect() }
    assert(e3.getMessage.contains("DsirScale"), e3.getMessage)
  }
}
