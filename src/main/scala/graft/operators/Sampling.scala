package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus mixing/sampling for training-data curation (SURVEY.md §2).
  *
  * mix_sample balances the `source` mixture: every source is
  * deterministically downsampled to the SMALLEST source's size (the
  * balanced-mixing target), the way a pre-training pipeline caps
  * over-represented domains before interleaving. Selection is a pure
  * per-row hash-threshold test — keep doc iff
  * h(doc_id) · n_source < M · target — so the plan is one narrow scan
  * plus two broadcast-joined tiny aggregates (per-source counts, their
  * min): no corpus shuffle, no per-source sort, identical decisions on
  * any cluster size. The hash is a shared integer formula
  * (doc_id·48271 mod 1048573) evaluated exactly in both engines; the
  * smallest source passes the threshold for every row, larger sources
  * keep a ~target-sized deterministic subset.
  */
object Sampling {

  val MixMod = 1048573L // prime modulus for the keep-threshold hash
  val MixMul = 48271L   // Lehmer/Park-Miller multiplier (public classic)

  private[graft] def mixSample(d: DataFrame): DataFrame = {
    val counts = d.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val target = counts.agg(min(col("ns")).as("t"))
    d.join(broadcast(counts), Seq("source"))
      .crossJoin(broadcast(target))
      .withColumn("h", (col("doc_id") * MixMul) % MixMod)
      // integer cross-multiplication: no division rounding to disagree on
      .filter(col("h") * col("ns") < lit(MixMod) * col("t"))
      .select(col("doc_id"), col("source"), col("h").as("mix_hash"))
  }

  private val opMix = Op(
    "mix_sample",
    (s, dir) => mixSample(Tables(s, dir, "documents")),
    Some(s"""
      WITH counts AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY 1),
      t AS (SELECT MIN(ns) AS t FROM counts)
      SELECT d.doc_id, d.source,
        (d.doc_id * $MixMul) % $MixMod AS mix_hash
      FROM documents d JOIN counts c ON d.source = c.source CROSS JOIN t
      WHERE ((d.doc_id * $MixMul) % $MixMod) * c.ns < $MixMod * t.t"""))

  val ops: Seq[Op] = Seq(opMix)
}
