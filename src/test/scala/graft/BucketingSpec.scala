package graft

import org.apache.spark.sql.functions._

/** SURVEY.md §4: pre-bucketed tables co-locate their join — the
  * shuffle moves to write time, amortized across every later join.
  * At 100 TB this is the difference between reshuffling the fact
  * table per query and never reshuffling it at all.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with NO exchange") {
    val l = Tables(spark, sfDir, "lineitem")
    val o = Tables(spark, sfDir, "orders")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
    // disable broadcast so the join itself must pick a strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      val joinExchanges = plan.split("HashAggregate").head // join subtree
      assert(!joinExchanges.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join should not reshuffle lineitem:\n$plan")
      val n = "Exchange".r.findAllIn(plan).size
      // only the final aggregation may exchange — never the join inputs
      assert(n <= 1, s"expected at most the agg exchange, got $n:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }
}
