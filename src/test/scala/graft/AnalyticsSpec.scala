package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("q33_scd2: change rows only, contiguous validity, one current row per user") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "a"),
      (2L, 5L, "x"))
      .toDF("user_id", "event_id", "event_type")
    val out = Analytics.scd2(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(out == Set(
      (1L, "a", 1L, 3L, 0L), (1L, "b", 3L, 4L, 0L), (1L, "a", 4L, -1L, 1L),
      (2L, "x", 5L, -1L, 1L)))
    // corpus-scale invariants: exactly one current row per user, and
    // valid_from strictly increases along each user's history
    val big = SparkEntry.queries("q33_scd2")(spark, sfDir).collect()
    big.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      assert(rs.count(_.getLong(4) == 1L) == 1, s"user $u current rows")
      val sorted = rs.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getLong(3) == y.getLong(2),
            s"user $u: interval gap ${x.getLong(3)} != ${y.getLong(2)}")
          assert(x.getString(1) != y.getString(1),
            s"user $u: consecutive rows share state (no-op row survived)")
        case _ => ()
      }
    }
  }

  test("q34_funnel: steps must occur in order; stage counts the deepest ordered prefix") {
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"), // full
      (2L, 10L, "click"), (2L, 11L, "view"), (2L, 12L, "purchase"),
      // click precedes view → no ordered click step; purchase needs
      // the click step, so user 2 stalls at stage 1 despite having
      // all three event types
      (3L, 20L, "view"), (3L, 21L, "click"),                     // stage 2
      (4L, 30L, "error"),                                        // stage 0
      (5L, 40L, "purchase"), (5L, 41L, "view"), (5L, 42L, "click")) // 2
      .toDF("user_id", "event_id", "event_type")
    val out = Analytics.funnel(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 2L))
    // step ids are the EARLIEST qualifying events
    val u1 = Analytics.funnel(ev).filter(col("user_id") === 1L).head
    assert(u1.getLong(1) == 1L && u1.getLong(2) == 2L && u1.getLong(3) == 3L)
  }

  test("q35_retention: offsets count from each user's first active day; day-distinct") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 23:00:00"), // same day
      (1L, "2024-01-02 01:00:00"), (1L, "2024-01-04 09:00:00"),
      (2L, "2024-01-02 12:00:00"))
      .toDF("user_id", "tss")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"))
    val out = Analytics.retention(ev).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) ->
        r.getLong(2)).toMap
    // user 1 cohort Jan 1: offsets 0, 1, 3 (the double event on day 0
    // counts once); user 2 cohort Jan 2: offset 0
    assert(out == Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L, ("2024-01-02", 0L) -> 1L))
  }

  test("q36_triangles: planted 3-cycle found once per corner; open path contributes nothing") {
    // one user walks 1→2→3→1 (edges 12, 23, 13 → one triangle); a
    // second walks 4→5 (an open edge, no triangle); a third revisits
    // 1→2 (duplicate edge must not double-count)
    def e(u: Long, id: Long, k: Int) = (u, id, s"""{"k": $k}""")
    val ev = (Seq(e(1L, 1L, 1), e(1L, 2L, 2), e(1L, 3L, 3), e(1L, 4L, 1),
        e(2L, 10L, 4), e(2L, 11L, 5), e(3L, 20L, 1), e(3L, 21L, 2)))
      .toDF("user_id", "event_id", "props")
    val out = Analytics.triangles(ev).collect()
      .map(r => r.getAs[Number]("node").longValue() ->
        r.getAs[Long]("n_triangles")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $out")
  }

  test("q36_triangles: two triangles sharing an edge attribute correctly") {
    // 1-2-3 and 2-3-4 share edge 23: nodes 2,3 sit in two triangles
    def e(u: Long, id: Long, k: Int) = (u, id, s"""{"k": $k}""")
    val ev = Seq(
        e(1L, 1L, 1), e(1L, 2L, 2), e(1L, 3L, 3), e(1L, 4L, 1),
        e(2L, 10L, 2), e(2L, 11L, 4), e(2L, 12L, 3))
      .toDF("user_id", "event_id", "props")
    // edges: 12 23 13 (u1), 24 34 (u2) → triangles {1,2,3}, {2,3,4}
    val out = Analytics.triangles(ev).collect()
      .map(r => r.getAs[Number]("node").longValue() ->
        r.getAs[Long]("n_triangles")).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L), s"got $out")
  }

  test("q37_grouping_sets: the two slices equal their standalone groupBys") {
    val ev = Tables.events(spark, sfDir)
    val out = Analytics.groupingSlices(ev).cache()
    try {
      // slice 1 (grouped by type): matches a plain groupBy(event_type)
      val byType = ev.groupBy(col("event_type"))
        .agg(sum(Fns.cents(col("value"))).as("sum_cents"),
          count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("sum_cents"), r.getAs[Long]("cnt"))).toMap
      val slice1 = out.filter(col("g_bucket") === 1L).collect()
      assert(slice1.length == byType.size)
      slice1.foreach { r =>
        assert(r.getAs[Long]("g_type") == 0L)
        assert(r.isNullAt(r.fieldIndex("user_bucket")),
          "grouped-out dim must be NULL")
        assert(byType(r.getAs[String]("event_type")) ==
          ((r.getAs[Long]("sum_cents"), r.getAs[Long]("cnt"))), r.toString)
      }
      // slice 2 (grouped by bucket): 10 buckets, NULL type, marker flipped
      val slice2 = out.filter(col("g_type") === 1L)
      assert(slice2.count() == 10L)
      assert(slice2.filter(col("event_type").isNotNull).count() == 0L)
      // both slices total the same corpus
      val tot = out.groupBy(col("g_type"))
        .agg(sum(col("cnt")).as("n")).collect()
        .map(r => r.getAs[Long]("g_type") -> r.getAs[Long]("n")).toMap
      assert(tot(0L) == tot(1L) && tot(0L) == ev.count())
    } finally out.unpersist()
  }

  test("q38_window_range: the frame is VALUE-bounded, not row-bounded") {
    // user 1 at sparse ids 1, 50, 120, 250 (cents 100..400): the
    // trailing-100 RANGE frame includes a row iff its id is within
    // 100, so id 250 sees ONLY itself — a ROWS-based rewrite would
    // wrongly include id 120's row
    val ev = Seq(
        (1L, 1L, 1.0), (1L, 50L, 2.0), (1L, 120L, 3.0), (1L, 250L, 4.0),
        (2L, 60L, 9.0)) // a second user must not leak into user 1's frame
      .toDF("user_id", "event_id", "value")
    val out = Analytics.windowRange(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        (r.getAs[Long]("trail_cents"), r.getAs[Long]("trail_n"))).toMap
    assert(out((1L, 1L)) == ((100L, 1L)), s"${out((1L, 1L))}")
    assert(out((1L, 50L)) == ((300L, 2L)), s"${out((1L, 50L))}")
    assert(out((1L, 120L)) == ((500L, 2L)), s"${out((1L, 120L))}")
    assert(out((1L, 250L)) == ((400L, 1L)), s"${out((1L, 250L))}")
    assert(out((2L, 60L)) == ((900L, 1L)), s"${out((2L, 60L))}")
  }

  test("q39_unpivot: melt equals the four per-measure aggregates, in ONE scan") {
    // one table scan: the melt is a single Expand over one read — the
    // alternative (four groupBy branches unioned) scans four times
    // (AQE wraps the plan; disable it so the scan nodes are visible)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val out =
      try {
        val q = SparkEntry.queries("q39_unpivot")(spark, sfDir)
        val plan = q.queryExecution.executedPlan
        val scans = plan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        assert(scans.length == 1, s"expected 1 scan:\n$plan")
        assert(plan.collectFirst {
          case e: org.apache.spark.sql.execution.ExpandExec => e
        }.nonEmpty, s"melt should lower to Expand:\n$plan")
        q
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val rows = out.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet ==
      Set("quantity", "extendedprice", "discount", "tax"))
    // cross-check each melted row against an independent direct agg
    val li = Tables(spark, sfDir, "lineitem")
    Seq("quantity" -> "l_quantity", "extendedprice" -> "l_extendedprice",
      "discount" -> "l_discount", "tax" -> "l_tax").foreach {
      case (m, c) =>
        val d = li.agg(
          sum(graft.Fns.cents(col(c))), count(lit(1)),
          min(graft.Fns.cents(col(c))), max(graft.Fns.cents(col(c)))).head
        assert(rows(m) ==
          ((d.getLong(0), d.getLong(1), d.getLong(2), d.getLong(3))), m)
    }
  }

  test("q40_gap_fill: LOCF carries the latest purchase price, -1 before the first") {
    val ev = Seq(
        (1L, 1L, "view", 0.0), (1L, 2L, "purchase", 3.5),
        (1L, 3L, "view", 0.0), (1L, 4L, "purchase", 7.25),
        (1L, 5L, "click", 0.0),
        (2L, 6L, "view", 0.0)) // user 2 never purchases
      .toDF("user_id", "event_id", "event_type", "value")
    val out = Analytics.gapFill(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1L, 1L) -> -1L, (1L, 2L) -> 350L, (1L, 3L) -> 350L,
      (1L, 4L) -> 725L, (1L, 5L) -> 725L, (2L, 6L) -> -1L))
    // corpus-scale invariant: fill is per-user monotone in coverage —
    // once a user has a price, every later event has one
    val big = SparkEntry.queries("q40_gap_fill")(spark, sfDir).collect()
    big.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      val firstPriced = sorted.indexWhere(_ >= 0L)
      if (firstPriced >= 0)
        assert(sorted.drop(firstPriced).forall(_ >= 0L),
          s"user $u: fill gap after first price")
    }
  }
}
