package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partitioned parquet sink + partition pruning on read-back
  * (SURVEY.md §2 sources/sinks). At 100 TB, partitioned layout is what
  * turns a full scan into a directory listing.
  */
class SinksSpec extends SparkSpec {

  test("partitioned write prunes partitions on filtered read-back") {
    val out = Files.createTempDirectory("graft-part").resolve("events").toString
    Tables.events(spark, sfDir)
      .write.partitionBy("event_type").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    val expected = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click").count()
    assert(back.count() == expected)
    // pruned scan reads only the one partition directory
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("event_type="))
    assert(dirs.length >= 2, "multiple partitions materialized")
  }

  test("q22_approx_sketch: sketches land within declared error of exact") {
    // one collect serves both the distinct-count and quantile checks
    val rows = operators.Relational2.ops.find(_.name == "q22_approx_sketch")
      .get.query(spark, sfDir).collect()
    val approx = rows
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("approx_parts"))
      .toMap
    val exact = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("exact_parts"))
      .toMap
    exact.foreach { case (flag, ex) =>
      val ap = approx(flag)
      assert(math.abs(ap - ex).toDouble / ex < 0.1,
        s"$flag: approx $ap vs exact $ex drifted > 10%")
    }
    // scalar quantile columns (driver-compatible schema: no arrays) land
    // within 5% of the exact percentiles
    val qs = rows
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("price_q50"), r.getAs[Double]("price_q95"))).toMap
    val exactQ = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.95)").as("e95")).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("e50"), r.getAs[Double]("e95"))).toMap
    exactQ.foreach { case (flag, (e50, e95)) =>
      val (a50, a95) = qs(flag)
      assert(a50 <= a95, s"$flag: q50 $a50 > q95 $a95")
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$flag: q50 $a50 vs exact $e50")
      assert(math.abs(a95 - e95) / e95 < 0.05, s"$flag: q95 $a95 vs exact $e95")
    }
  }
}
