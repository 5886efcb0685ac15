package graft.sources

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN serving-index persistence (SURVEY.md §2 sources/sinks:
  * sink_ann_index) — the "build once, serve later" contract a real
  * serving stack needs: index construction is the expensive offline
  * job (bounded k-means + PQ training + a full encode pass), serving
  * restarts must NOT repeat it. One bundle under `path`:
  *
  *   codes/      int8 candidate codes (c_id, c_q), range-sharded on
  *               c_id via the sink_shards layout — bounded contiguous
  *               shards a serving loader streams straight into the
  *               flat in-memory index (graft.plans.AnnServe.Index)
  *   centroids/  the IVF coarse centroids (cent_id, cent_emb)
  *   pq/         the PQ codebook as ONE row (m, k, flat codebook) —
  *               KBs even at k=256·m=8·dim=64
  *
  * Everything is plain parquet: readable by any engine, partition-
  * prunable, and the read-back spec proves codes/centroids/codebook
  * round-trip bit-exactly and that serving from the reloaded bundle
  * equals the freshly-built batch answer row-for-row.
  */
object AnnIndex {

  def write(e: DataFrame, path: String, nShards: Int = 4): Unit = {
    val spark = e.sparkSession
    Similarity.int8Codes(e)
      .repartitionByRange(nShards, col("c_id"))
      .sortWithinPartitions(col("c_id"))
      .write.mode("overwrite").parquet(s"$path/codes")
    val k = Similarity.ivfK(e.count())
    val cents = Similarity.kmeansCentroids(e, k, Similarity.KmeansIters)
    spark.createDataFrame(cents.toSeq).toDF("cent_id", "cent_emb")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val (cb, kEff) = Similarity.pqCodebook(
      e, Similarity.PqM, Similarity.PqK, Similarity.KmeansIters)
    spark.createDataFrame(Seq((Similarity.PqM, kEff, cb.toSeq)))
      .toDF("m", "k", "codebook")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pq")
  }

  def readCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codes")

  def readCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/centroids")

  /** (flat codebook, m, k) — the graft_pq_cos/graft_pq_encode args. */
  def readPq(spark: SparkSession, path: String): (Array[Float], Int, Int) = {
    val r = spark.read.parquet(s"$path/pq").head()
    (r.getSeq[Float](2).toArray, r.getInt(0), r.getInt(1))
  }
}
