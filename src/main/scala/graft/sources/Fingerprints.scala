package graft.sources

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup fingerprint-store persistence (SURVEY.md §2 sources/sinks:
  * sink_fingerprints) — the "derive once, probe forever" contract the
  * incremental-ingest family needs: deriving the standing corpus's
  * fingerprints is the expensive offline pass (a full history scan +
  * hash), and an ingest tick must NOT repeat it — at 100 TB a
  * re-derivation per arriving shard re-pays the whole corpus on every
  * tick, which is exactly the cost the asymmetric new×history join
  * exists to avoid. One parquet bundle under `path`, each frame the
  * skinny DISTINCT form its probe join consumes (reference shape:
  * kv_store/kv_loading_interface.py persists derived per-doc state so
  * serving never recomputes it from raw inputs):
  *
  *   content/  (th)        md5 content hashes → exact-dup gate
  *                         (dedup_incremental, stream_ingest)
  *   bands/    (band_val)  MinHash LSH band values, ≤ 8 longs/doc →
  *                         near-dup gate (dedup_incr_minhash,
  *                         stream_ingest_minhash)
  *   spans/    (h)         W=8 token-span hashes → verbatim-containment
  *                         coverage (dedup_incremental)
  *
  * All three are range-sharded on their hash key (the sink_shards
  * layout): contiguous non-overlapping files a 1000-executor probe
  * join co-partitions against, and a growing corpus appends new
  * shards without rewriting old ones. Plain parquet — partition-
  * prunable, engine-neutral. The round-trip spec (SinksSpec) proves
  * ingest flags from the RELOADED store equal the derive-fresh path
  * row-for-row, and the plan spec proves the store-fed ingest never
  * scans history documents.
  */
object Fingerprints {

  def write(hist: DataFrame, path: String, nShards: Int = 4): Unit = {
    hist.select(md5(col("text")).as("th")).distinct()
      .repartitionByRange(nShards, col("th"))
      .sortWithinPartitions(col("th"))
      .write.mode("overwrite").parquet(s"$path/content")
    Dedup.minhashSigs(hist)
      .select(explode(col("bands")).as("band_val")).distinct()
      .repartitionByRange(nShards, col("band_val"))
      .sortWithinPartitions(col("band_val"))
      .write.mode("overwrite").parquet(s"$path/bands")
    Dedup.spanHashes(hist).select(col("h")).distinct()
      .repartitionByRange(nShards, col("h"))
      .sortWithinPartitions(col("h"))
      .write.mode("overwrite").parquet(s"$path/spans")
  }

  def readContent(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/content")

  def readBands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/bands")

  def readSpans(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/spans")
}
