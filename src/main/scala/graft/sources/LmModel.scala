package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sink_lm — persistence for the reference perplexity model
  * (perplexity_filter's training product), the same "derive once,
  * probe forever" contract as sink_fingerprints: at 100 TB the
  * reference LM is trained ONCE and every later shard/stream is scored
  * against the frozen bundle — re-deriving the counts per ingest tick
  * would re-pay the reference-corpus scan every time (the exact
  * anti-pattern the fingerprint store closed for dedup).
  *
  * Bundle layout (all skinny, range-sharded on their join keys so a
  * large cluster's probe joins co-partition against contiguous files):
  *   bigrams/   (w1, w2, c12)  — bigram counts of the reference slice
  *   contexts/  (w1, c1)       — context totals (kept SEPARATE from
  *                               bigrams: an unseen bigram with a known
  *                               context must still find c1)
  *   meta/      (v)            — one row, vocabulary size
  *   cuts/      (lang, cut_head, cut_mid) — the per-language mean-
  *               surprisal thresholds realizing the batch op's thirds;
  *               CCNet-style: computed once, applied as constants
  */
object LmModel {

  def write(all: DataFrame, path: String, nShards: Int = 2): Unit = {
    val (c2, c1, v) = graft.operators.LangModel.refCounts(all)
    c2.repartitionByRange(nShards, col("w1"), col("w2"))
      .sortWithinPartitions(col("w1"), col("w2"))
      .write.mode("overwrite").parquet(s"$path/bigrams")
    c1.repartitionByRange(nShards, col("w1"))
      .sortWithinPartitions(col("w1"))
      .write.mode("overwrite").parquet(s"$path/contexts")
    v.coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    graft.operators.LangModel.langCuts(all)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/cuts")
  }

  def readBigrams(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/bigrams")

  def readContexts(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/contexts")

  def readMeta(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/meta")

  def readCuts(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/cuts")

  /** Batch store-fed scoring: docs × the RELOADED bundle, per-doc
    * stats identical to in-line training (round-trip spec). */
  def scoreFrom(docs: DataFrame, path: String): DataFrame = {
    val s = docs.sparkSession
    graft.operators.LangModel.scoreAgainst(docs,
      readBigrams(s, path), readContexts(s, path), readMeta(s, path))
  }
}
