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
    val approx = operators.Relational2.ops.find(_.name == "q22_approx_sketch")
      .get.query(spark, sfDir).collect()
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
  }
}
