package graft

import graft.operators.Relational2
import org.apache.spark.sql.functions._

class Relational2Spec extends SparkSpec {

  private def run(name: String) =
    Relational2.ops.find(_.name == name).get.query(spark, sfDir)

  test("q29_sketch_merge: shard-union estimate == single-pass; within 10% of exact") {
    import org.apache.spark.sql.functions._
    val got = run("q29_sketch_merge").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("est_parts"))).toMap
    val li = Tables(spark, sfDir, "lineitem")
    // merge property: union of per-shard sketches must equal the
    // single-pass sketch over the whole table (same lgK; register
    // state is a max — order- and shard-independent)
    val direct = li.agg(expr(
      s"hll_sketch_estimate(hll_sketch_agg(l_partkey, ${operators.Relational2.SketchLgK}))"))
      .head.getLong(0)
    assert(got("ALL")._2 == direct,
      s"merged ${got("ALL")._2} != single-pass $direct")
    // accuracy: every estimate within 10% of exact NDV
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("nd")).toMap
    exact.foreach { case (flag, ex) =>
      val est = got(flag)._2
      assert(math.abs(est - ex).toDouble / ex < 0.1,
        s"$flag: estimate $est vs exact $ex drifted > 10%")
    }
    assert(got("ALL")._1 == li.count())
  }

  test("q28_skew_salted: both shuffles carry partial-aggregate rows only") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    // the salted two-level plan: partial (key, salt) aggregation fans
    // hot keys over salts reducers, the finalize re-aggregates by key —
    // so BOTH shuffles move partial sum/count buffers, never raw fact
    // rows (the plain groupBy lands each hot key's full row set on one
    // reducer; this plan must not)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("q28_skew_salted").queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 2,
        s"two-level salt = exactly two shuffles:\n$plan")
      shuffles.foreach { e =>
        assert(!e.output.exists(_.name.contains("l_extendedprice")),
          s"raw fact rows crossed a shuffle:\n$e")
        assert(e.child.collectFirst {
          case a: HashAggregateExec => a }.nonEmpty,
          s"a shuffle input is not a partial aggregate:\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q29_sketch_merge: ONE table scan feeds both the shards and the union") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // the shard sketches are checkpointed at construction; the per-flag
    // estimates AND the union rollup both read those 3 sketch rows —
    // across every job the op runs, lineitem is scanned exactly once
    // (the incremental-stats contract: rollups never rescan)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.listenerManager.register(listener)
    try {
      run("q29_sketch_merge").write.format("noop").mode("overwrite").save()
      var last = -1
      while (plans.size != last) { last = plans.size; Thread.sleep(500) }
      val scans = plans.toArray(Array.empty[
          org.apache.spark.sql.execution.SparkPlan])
        .flatMap(_.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s })
      assert(scans.length == 1,
        s"lineitem scanned ${scans.length} times across the op's jobs")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("q30_full_outer: both sides pre-aggregate BEFORE the outer join") {
    import org.apache.spark.sql.catalyst.plans.FullOuter
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // the reconciliation shape: the outer join shuffles two already-
    // reduced per-key frames — fact columns (o_totalprice, the event
    // value) must never cross an exchange, and each join input subtree
    // must contain its aggregate
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("q30_full_outer").queryExecution.executedPlan
      val fo = plan.collect {
        case j: BaseJoinExec if j.joinType == FullOuter => j }
      assert(fo.size == 1, s"exactly one full-outer join:\n$plan")
      Seq(fo.head.left, fo.head.right).foreach { side =>
        assert(side.collectFirst {
          case a: HashAggregateExec => a }.nonEmpty,
          s"a join side is not pre-aggregated:\n$side")
      }
      plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
        assert(!e.output.exists(a =>
          a.name == "o_totalprice" || a.name == "value"),
          s"raw fact rows crossed a shuffle:\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q31_compact_latest: one newest row per key via the heap, not a window") {
    // plan first (before any caching can hide the operator behind an
    // InMemoryTableScan): two-phase heap at k=1, never a per-key
    // history window
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("q31_compact_latest").queryExecution.executedPlan
      assert(plan.collect {
        case t: graft.plans.TopKPerKeyFinalExec => t }.nonEmpty,
        s"expected the TopKPerKey heap exec:\n$plan")
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty,
        s"a rank window buffers each key's full history:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val out = run("q31_compact_latest")
    val e = Tables.events(spark, sfDir)
    // exactly one row per live (user, event_type) key
    assert(out.count() ==
      e.select("user_id", "event_type").distinct().count())
    assert(out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
    // the kept row is the true per-key max (ts_us, event_id)
    val maxTs = e.groupBy(col("user_id"), col("event_type"))
      .agg(max(expr("struct(unix_micros(cast(ts as timestamp)) AS ts_us, event_id)")).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.ts_us").as("ts_us"), col("m.event_id").as("event_id"))
    assert(out.select("user_id", "event_type", "ts_us", "event_id")
      .except(maxTs).count() == 0)
  }

  test("q30_full_outer: presence classes partition the key union; counts null-safe") {
    import org.apache.spark.sql.functions._
    val rows = run("q30_full_outer").collect()
    val oKeys = Tables(spark, sfDir, "orders")
      .select(col("o_custkey")).distinct().count()
    val eKeys = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    val both = rows.count(_.getAs[String]("presence") == "both")
    val oOnly = rows.count(_.getAs[String]("presence") == "orders_only")
    val eOnly = rows.count(_.getAs[String]("presence") == "events_only")
    // the three classes tile the key union exactly
    assert(rows.length == both + oOnly + eOnly)
    assert(both + oOnly == oKeys && both + eOnly == eKeys)
    rows.foreach { r =>
      r.getAs[String]("presence") match {
        case "both" => assert(r.getAs[Long]("n_orders") > 0 &&
          r.getAs[Long]("n_events") > 0)
        case "orders_only" => assert(r.getAs[Long]("n_orders") > 0 &&
          r.getAs[Long]("n_events") == 0)
        case _ => assert(r.getAs[Long]("n_orders") == 0 &&
          r.getAs[Double]("sum_spend") == 0.0)
      }
    }
  }

  test("every q15-q21 op executes and returns rows") {
    Relational2.ops.foreach { op =>
      assert(op.query(spark, sfDir).count() > 0, s"${op.name} empty")
    }
  }

  test("q26: asof attaches the latest prior view, equal ts counts, none → null") {
    import spark.implicits._
    // sf events: every purchase must match the latest view with
    // v.ts <= p.ts for the same user — verified per-row against a
    // driver-side replay of the asof rule
    val out = run("q26_asof_join").collect()
    val views = Tables.events(spark, sfDir).filter($"event_type" === "view")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp))", "event_id")
      .as[(Long, Long, Long)].collect()
    val byUser = views.groupBy(_._1)
    out.foreach { r =>
      val u = r.getAs[Long]("user_id")
      // the events table's ts may be LTZ (java.sql.Timestamp) or NTZ
      // (LocalDateTime, read-as-UTC) depending on the parquet writer
      val pTs = r.get(r.fieldIndex("p_ts")) match {
        case t: java.sql.Timestamp =>
          t.getTime * 1000 + (t.getNanos / 1000) % 1000
        case d: java.time.LocalDateTime =>
          d.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
            d.getNano / 1000L
      }
      val cands = byUser.getOrElse(u, Array.empty).filter(_._2 <= pTs)
      if (cands.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("v_id")), s"user $u: expected no view")
      } else {
        val best = cands.maxBy(v => (v._2, v._3))
        assert(r.getAs[Long]("v_id") == best._3,
          s"user $u purchase@$pTs: got ${r.getAs[Long]("v_id")}, want ${best._3}")
        assert(r.getAs[Long]("gap_us") == pTs - best._2)
      }
    }
    assert(out.length > 0 && views.length > 0)
  }

  test("q27: binned range join equals the naive inequality join, no BNLJ") {
    import spark.implicits._
    val df = run("q27_range_join")
    // the binning must have produced a hash join — a raw inequality
    // join degenerates to BroadcastNestedLoopJoin
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    // driver-side replay of the exact range predicate
    val e = Tables.events(spark, sfDir)
    val views = e.filter($"event_type" === "view")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp))")
      .as[(Long, Long)].collect().groupBy(_._1)
    val out = df.selectExpr("user_id", "p_id", "unix_micros(cast(p_ts as timestamp))", "n_views_1h")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (u, pid, pUs, n) =>
      val expect = views.getOrElse(u, Array.empty).count { case (_, vUs) =>
        vUs <= pUs && pUs - vUs <= operators.Relational2.RangeUs
      }
      assert(n == expect, s"purchase $pid: binned $n vs naive $expect")
    }
  }

  test("q24: CUBE computes all grouping sets through ONE shuffle (Expand before Exchange)") {
    val plan = run("q24_cube").queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"CUBE must expand grouping sets:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"CUBE should aggregate through exactly one shuffle, got $shuffles:\n$plan")
    // map-side partial agg: a partial_count must appear below the Exchange
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"no map-side partial aggregation:\n$plan")
  }

  test("q25: INTERSECT/EXCEPT lower to semi/anti joins on pruned keys") {
    val df = run("q25_set_ops")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"INTERSECT must lower to a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"EXCEPT must lower to an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan)
    // column pruning: only the key column reaches the scans
    assert(df.queryExecution.optimizedPlan.toString.contains("o_custkey"))
  }

  test("q26: the asof plan is JOIN-FREE — union + window, never a range join") {
    val plan = run("q26_asof_join").queryExecution.executedPlan.toString
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoop", "CartesianProduct").foreach { j =>
      assert(!plan.contains(j), s"asof must not plan a $j:\n$plan")
    }
    assert(plan.contains("Window"), plan)
    // two key shuffles max: the per-(user, ts) view dedup and the
    // per-user window — nothing proportional to pairs
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, s"asof should shuffle at most twice, got $shuffles:\n$plan")
  }

  test("q15: selected supplier(s) hold the maximum revenue") {
    val rows = run("q15_top_supplier").collect()
    val revs = rows.map(_.getAs[Double]("revenue")).distinct
    assert(revs.length == 1, "all selected rows share the max revenue")
  }

  test("q17: small-qty revenue is a strict subset of brand revenue") {
    val small = run("q17_small_qty").head().getAs[Double]("small_qty_revenue")
    val l = Tables(spark, sfDir, "lineitem")
    val p = Tables(spark, sfDir, "part").filter(col("p_brand") === "Brand#5")
    val all = l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(sum(col("l_extendedprice"))).head().getDouble(0)
    assert(small < all)
  }

  test("q18: every returned order exceeds the quantity threshold") {
    assert(run("q18_large_orders").filter(col("total_qty") <= 250).count() == 0)
  }

  test("q21: chain excludes customers with any completed order") {
    val bad = run("q21_semi_anti_chain")
      .join(Tables(spark, sfDir, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    assert(bad == 0)
  }
}
