package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.ts` is written as parquet INT64 TIMESTAMP(NANOS). Spark's
  * TimestampType is microsecond-precision; if this Spark build rejects
  * NANOS we re-read with `nanosAsLong` and truncate to micros — the same
  * truncation DuckDB applies casting ns → TIMESTAMP, so oracle
  * comparisons stay exact.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  // Integral DIV, not `/`: epoch-nanos (~1.7e18) exceeds double's 53-bit
  // mantissa, so float division here would drift timestamps by ±1 µs.
  private def nsLongToTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    try {
      val df = spark.read.parquet(path)
      if (df.schema("ts").dataType == LongType) nsLongToTs(df) else df
    } catch {
      // ONLY the nanos-precision rejection gets the legacy-conf retry;
      // a missing/corrupt file must surface its real error, not a
      // misleading second failure after a session-global conf mutation
      case e: Exception if e.getMessage != null &&
          e.getMessage.contains("TIMESTAMP(NANOS") =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        nsLongToTs(spark.read.parquet(path))
    }
  }
}
