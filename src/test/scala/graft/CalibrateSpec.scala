package graft

import graft.operators.Calibrate
import org.apache.spark.sql.functions._

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  // Controlled diversity scores: distinct/total in ppm per doc.
  private def fixture = Seq(
    (1L, "a a a a", "s1"), // 250000
    (2L, "a b a b", "s1"), // 500000 (tie with doc 4)
    (3L, "a b c d", "s1"), // 1000000
    (4L, "a a b b", "s1"), // 500000
    (5L, "a b c c", "s1")) // 750000
    .toDF("doc_id", "text", "source")

  test("score_calibrate: hand-derived per-source percentiles, ties share min rank") {
    val rows = Calibrate.calibrateExact(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score_ppm"), r.getAs[Long]("pct_ppm"),
          r.getAs[Long]("keep"))).toMap
    assert(rows(1L) == (250000L, 0L, 0L))
    assert(rows(2L) == (500000L, 250000L, 1L)) // rank 2 of 5
    assert(rows(4L) == (500000L, 250000L, 1L)) // tie → same pct
    assert(rows(5L) == (750000L, 750000L, 1L))
    assert(rows(3L) == (1000000L, 1000000L, 1L))
  }

  test("score_calibrate: percentiles are per-source — same score, different slice rank") {
    // doc 10's score is the WORST of s2 but would be mid-pack in s1:
    // calibration must rank it within its own source only
    val d = fixture.unionByName(Seq(
      (10L, "a b a b", "s2"), // 500000 — lowest in s2
      (11L, "a b c d", "s2"),
      (12L, "a b c e", "s2")).toDF("doc_id", "text", "source"))
    val rows = Calibrate.calibrateExact(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pct_ppm")).toMap
    assert(rows(10L) == 0L, "bottom of its own source")
    assert(rows(2L) == 250000L, "s1 ranks unchanged by s2's docs")
  }

  test("score_calibrate_sketch: rank estimates within 5% of exact inclusive ranks") {
    val d = Tables(spark, sfDir, "documents")
    val model = Calibrate.calibrationModel(d)
    val est = Calibrate.calibrateFrom(d, model).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Long]("score_ppm"),
          r.getAs[Double]("pct_est"), r.getAs[Long]("keep"))).toMap
    // exact inclusive rank: fraction of same-source scores <= mine
    val scores = Calibrate.scored(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = scores.groupBy(_._2)
    assert(est.size == scores.length)
    scores.foreach { case (id, src, sc) =>
      val all = bySrc(src).map(_._3)
      val incl = all.count(_ <= sc).toDouble / all.length
      val (esrc, esc, pct, keep) = est(id)
      assert(esrc == src && esc == sc)
      assert(math.abs(pct - incl) <= 0.05,
        s"doc $id rank est $pct vs exact inclusive $incl")
      assert(keep == (if (pct >= Calibrate.KeepFloorPpm / 1e6) 1L else 0L))
    }
    // the gate is non-degenerate on the corpus
    assert(est.values.exists(_._4 == 0L) && est.values.exists(_._4 == 1L))
  }

  test("sink_calibration: round-trip serves identically; append folds; stale format refused") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-calib").toString
    val d = Tables(spark, sfDir, "documents")
    val model = Calibrate.calibrationModel(d).localCheckpoint()
    sources.CalibrationStore.write(model, dir)
    val back = sources.CalibrationStore.read(spark, dir)
    def served(m: org.apache.spark.sql.DataFrame) =
      Calibrate.calibrateFrom(d, m).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("pct_est"), r.getAs[Long]("keep"))).toMap
    assert(served(back) == served(model),
      "the reloaded sketches must serve bit-identically")
    // append a second shard: counts sum; ranks stay within the exact
    // band over the COMBINED corpus (KLL merge keeps the guarantee)
    val shard = d.withColumn("doc_id", col("doc_id") + 100000L)
    sources.CalibrationStore.append(
      Calibrate.calibrationModel(shard), dir)
    val merged = sources.CalibrationStore.read(spark, dir)
    val n0 = model.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(merged.agg(sum(col("n"))).collect()(0).getLong(0) == 2 * n0)
    val combined = d.unionByName(shard)
    val scores = Calibrate.scored(combined).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = scores.groupBy(_._2)
    val est = Calibrate.calibrateFrom(combined, merged).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("pct_est")).toMap
    scores.foreach { case (id, src, sc) =>
      val all = bySrc(src).map(_._3)
      val incl = all.count(_ <= sc).toDouble / all.length
      assert(math.abs(est(id) - incl) <= 0.05,
        s"post-append doc $id est ${est(id)} vs exact $incl")
    }
    // stale marker → loud refusal, not silently shifted percentiles
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_graft_format"), "99")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._graft_format.crc"))
    val e = intercept[IllegalArgumentException](
      sources.CalibrationStore.read(spark, dir))
    assert(e.getMessage.contains("format version"))
  }

  test("driver rows: exact carries the oracle, sketch is rows-only") {
    assert(SparkEntry.oracleSql.contains("score_calibrate"))
    assert(!SparkEntry.oracleSql.contains("score_calibrate_sketch"))
    assert(SparkEntry.queries("score_calibrate")(spark, sfDir)
      .collect().nonEmpty)
  }
}
