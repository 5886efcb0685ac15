package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  private def run(name: String) =
    Relational.ops.find(_.name == name).get.query(spark, sfDir)

  test("every relational op executes and returns rows") {
    Relational.ops.foreach { op =>
      val n = op.query(spark, sfDir).count()
      assert(n > 0, s"${op.name} returned 0 rows")
    }
  }

  test("q1_agg: groups are (returnflag, linestatus) and sums positive") {
    val rows = run("q1_agg").collect()
    assert(rows.length <= 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q2_filter_project: predicate and projection are pushed to the scan") {
    val df = run("q2_filter_project")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), "no pushed filters in scan")
    assert(plan.contains("p_size") || plan.contains("p_type"))
    // pruned read schema: only the 6 needed columns, not all of part
    assert(!plan.contains("p_retailprice,p_comment"))
  }

  test("q4_broadcast_dim: dims are broadcast, not shuffled") {
    val plan = run("q4_broadcast_dim").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q5_sort_topk: globally sorted descending, deterministic") {
    val prices = run("q5_sort_topk").collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 15)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q6_window_rank: at most 3 rows per customer, rank within [1,3]") {
    val df = run("q6_window_rank")
    val maxPer = df.groupBy(col("o_custkey")).count()
      .agg(max("count")).head().getLong(0)
    assert(maxPer <= 3)
    val rks = df.select("rk").distinct().collect().map(_.getLong(0)).sorted
    assert(rks.forall(r => r >= 1 && r <= 3))
  }

  test("q7/q8: semi and anti partition the supplier/customer space") {
    val anti = run("q8_anti_join").count()
    val customers = Tables(spark, sfDir, "customer").count()
    assert(anti < customers)
  }

  test("q9_rollup: contains grand total row equal to full count") {
    val total = run("q9_rollup")
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .collect()
    assert(total.length == 1)
    assert(total.head.getAs[Long]("cnt") ==
      Tables(spark, sfDir, "lineitem").count())
  }

  test("q14_sessionize: session bounds ordered, counts sum to all events") {
    val df = run("q14_sessionize")
    assert(df.filter(col("session_start") > col("session_end")).count() == 0)
    val sum = df.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(sum == Tables.events(spark, sfDir).count())
  }
}
