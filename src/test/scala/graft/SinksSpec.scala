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

  test("sink_shards: bounded files, contiguous key ranges, lossless read-back") {
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val out = Files.createTempDirectory("graft-shard").resolve("shards").toString
    sources.Sinks.writeShards(docs, out, "doc_id",
      nShards = 3, maxRecordsPerFile = 20)
    // lossless: the read-back id set is exactly the input id set
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").except(docs.select("doc_id")).count() == 0)
    // bounded: no file exceeds maxRecordsPerFile; contiguous: per-file
    // [min,max] doc_id ranges never overlap (the curriculum/sequential-
    // reader property range partitioning + in-partition rolling buys)
    val perFile = back
      .withColumn("f", org.apache.spark.sql.functions.input_file_name())
      .groupBy(col("f"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.min(col("doc_id")).as("lo"),
        org.apache.spark.sql.functions.max(col("doc_id")).as("hi"))
      .collect()
    assert(perFile.length > 3, "maxRecordsPerFile should split shards")
    perFile.foreach(r => assert(r.getAs[Long]("n") <= 20L, r.toString))
    val ranges = perFile.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: $hi1 >= $lo2")
      case _ => ()
    }
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
