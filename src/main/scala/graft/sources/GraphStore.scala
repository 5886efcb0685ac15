package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sink_graph — persistence for the navigation edge list
  * (graph_pagerank's input; stream_graph's output), completing the
  * derive-once arc for the graph tier: the event log is windowed into
  * transition edges ONCE (or maintained incrementally by
  * stream_graph's deltas), and every rank run reads the folded skinny
  * edge store instead of re-windowing the log — at 100 TB the log
  * scan dwarfs the 8 rank sweeps it feeds.
  *
  * Layout: `edges/` (src, dst, w) range-sharded on (src, dst). Edge
  * WEIGHTS are additive, so maintenance is the LmModel move, not the
  * Fingerprints one: `append` lands a delta's partial counts as new
  * files and [[readEdges]] folds by summing per (src, dst) —
  * stream_graph's per-batch deltas append verbatim (same schema).
  * [[compact]] folds the accumulated files back to clean shards on
  * the maintenance cadence (temp-dir + swap, the Fingerprints
  * staging).
  */
object GraphStore {

  /** Bundle format version (`_graft_format` marker, shared
    * [[StoreMaintenance]] scheme). Version history:
    *
    *   - 1 — `edges/` holds (src, dst, w) with ADDITIVE weights
    *     derived from the session-window transition edges of
    *     stream_graph / graph_pagerank's windowing. A change to edge
    *     derivation (window gap, self-loop policy) would fold old and
    *     new semantics into one weight sum with no error — refusal
    *     instead.
    */
  val FormatVersion = 1

  private def checkFormat(spark: SparkSession, path: String): Unit =
    StoreMaintenance.checkFormat(spark, path, FormatVersion,
      "graph", "additive session-window transition edges")

  def write(edges: DataFrame, path: String, nShards: Int = 2): Unit = {
    edges.select(col("src"), col("dst"), col("w"))
      .repartitionByRange(nShards, col("src"), col("dst"))
      .sortWithinPartitions(col("src"), col("dst"))
      .write.mode("overwrite").parquet(s"$path/edges")
    StoreMaintenance.markFormat(edges.sparkSession, path, FormatVersion)
  }

  /** Append a delta edge frame (src, dst, w) — counts additive,
    * history untouched; readers fold. stream_graph's CardDelta-style
    * (src, dst, w_delta) output appends here after a rename. Refuses
    * an old-format bundle (mixed edge semantics under one sum). */
  def append(delta: DataFrame, path: String, nShards: Int = 1): Unit = {
    checkFormat(delta.sparkSession, path)
    delta.select(col("src"), col("dst"), col("w"))
      .repartitionByRange(nShards, col("src"), col("dst"))
      .sortWithinPartitions(col("src"), col("dst"))
      .write.mode("append").parquet(s"$path/edges")
    StoreMaintenance.markFormat(delta.sparkSession, path, FormatVersion)
  }

  /** Folded per-(src, dst) weights — append-safe. */
  def readEdges(spark: SparkSession, path: String): DataFrame = {
    checkFormat(spark, path)
    spark.read.parquet(s"$path/edges")
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
  }

  /** Fold the accumulated append files to nShards clean ones (weights
    * summed); gating/rank results identical before and after.
    * Crash-safe through the shared StoreMaintenance staging. */
  def compact(spark: SparkSession, path: String, nShards: Int = 2): Unit = {
    val (dir, tmp, old) = StoreMaintenance.staging(path, "edges")
    StoreMaintenance.recover(spark, dir, tmp, old)
    readEdges(spark, path)
      .repartitionByRange(nShards, col("src"), col("dst"))
      .sortWithinPartitions(col("src"), col("dst"))
      .write.mode("overwrite").parquet(tmp.toString)
    StoreMaintenance.swap(spark, dir, tmp, old)
  }

  /** PageRank over the RELOADED store — the rank sweeps never touch
    * the event log (equal to the in-line op when the store holds the
    * same log's edges, spec'd). */
  def pagerankFrom(spark: SparkSession, path: String): DataFrame =
    graft.operators.Graph.pagerankEdges(readEdges(spark, path))
}
