package graft

import graft.operators.{Profile, Sampling}
import org.apache.spark.sql.functions._

/** outlier_mad(+_sketch) and curriculum_order. */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("event_id", "event_type", "value")

  test("outlier_mad: a wild value cannot hide itself (σ can, MAD can't)") {
    // type a: 9 values at 10.00 ± ≤0.02 and one at 1000.00. The mean/
    // stddev z-score of the wild point is ~3·σ-ish only because the
    // wild point INFLATED σ itself; the median/MAD fence is immune:
    // med = 10.00-ish, MAD ≈ 1 cent, the wild dev ≈ 99000 cents.
    val rows = (1L to 9L).map(i =>
      (i, "a", 10.0 + (i % 3 - 1) * 0.01)) :+ ((10L, "a", 1000.0))
    val out = Profile.outlierMad(ev(rows: _*)).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("is_outlier"), r.getAs[Double]("dev"))).toMap
    assert(out(10L)._1 == 1L, s"wild point not flagged: ${out(10L)}")
    assert((1L to 9L).forall(out(_)._1 == 0L),
      s"inliers flagged: ${out.filter(_._2._1 == 1L)}")
  }

  test("outlier_mad: exact dyadic arithmetic — known median and MAD") {
    // cents {100, 200, 300, 400}: med = 250.0 (interpolated half),
    // devs {150, 50, 50, 150}: mad = 100.0; 3·mad = 300 → nothing out
    val out = Profile.outlierMad(ev(
        (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0)))
      .collect()
    assert(out.forall(_.getAs[Double]("med") == 250.0))
    assert(out.forall(_.getAs[Double]("mad") == 100.0))
    assert(out.forall(_.getAs[Long]("is_outlier") == 0L))
    // types are fenced independently: a tight second type flags its own
    val out2 = Profile.outlierMad(ev(
        (1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 1.0), (4L, "a", 50.0),
        (5L, "b", 50.0)))
      .collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[Long]("is_outlier"))).toMap
    assert(out2(4L) == 1L && out2(5L) == 0L, s"$out2")
  }

  test("outlier_mad_sketch: fixture flags agree with exact within the rank-error band") {
    val e = Tables.events(spark, sfDir)
    val exact = Profile.outlierMad(e)
      .select(col("event_id"), col("is_outlier").as("x"))
    val sk = Profile.outlierMadSketch(e)
      .select(col("event_id"), col("is_outlier").as("s"))
    val n = e.count()
    val disagree = exact.join(sk, Seq("event_id"))
      .filter(col("x") =!= col("s")).count()
    // KLL rank error ~1.65% on two quantile levels: allow 5% of rows
    assert(disagree * 20L <= n, s"$disagree / $n flags disagree")
  }

  test("curriculum_order: phases are rank-exact, tie-atomic, monotone") {
    // 10 distinct difficulties → exactly one doc per phase 0..9;
    // a tie group must land in ONE phase (no ntile tie-splitting)
    val docs = (1L to 10L).map(i => (i, Seq.fill(i.toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sampling.curriculumOrder(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phase")).toMap
    assert(out == (1L to 10L).map(i => i -> (i - 1)).toMap, s"$out")

    val tied = (Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a")) ++
      Seq((5L, "a b"), (6L, "a b c"))).toDF("doc_id", "text")
    val t = Sampling.curriculumOrder(tied).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phase")).toMap
    // 4-way tie at difficulty 1: below=0 → phase 0 for ALL of them;
    // difficulty 2: below=4 → floor(40/6)=6; difficulty 3: below=5 → 8
    assert(t == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 6L, 6L -> 8L), s"$t")
  }

  test("curriculum_order: fixture — phases cover 0..9, monotone in difficulty") {
    val out = Sampling.curriculumOrder(
      Tables(spark, sfDir, "documents")).cache()
    try {
      val phases = out.select(col("phase")).distinct()
        .collect().map(_.getLong(0)).sorted
      assert(phases.head >= 0L && phases.last <= 9L, phases.mkString(","))
      // monotone: a harder doc never gets an earlier phase
      val byDiff = out.groupBy(col("difficulty"))
        .agg(min(col("phase")).as("lo"), max(col("phase")).as("hi"))
        .collect().sortBy(_.getAs[Long]("difficulty"))
      byDiff.foreach(r => assert(
        r.getAs[Long]("lo") == r.getAs[Long]("hi"), s"tie split: $r"))
      byDiff.sliding(2).foreach {
        case Array(a, b) => assert(
          a.getAs[Long]("lo") <= b.getAs[Long]("lo"), s"$a !<= $b")
        case _ =>
      }
    } finally out.unpersist()
  }
}
