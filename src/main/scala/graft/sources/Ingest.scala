package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ingest_e2e — the composed gate-then-remember loop, one tick of the
  * deployment ingest firewall against the PERSISTED stores:
  *
  *   1. GATE: the arriving shard is flagged by the bloom-accelerated
  *      exact gate (Dedup.bloomGateFrom over the store's `content/`
  *      frame — "definitely new" costs zero shuffle) and the near-dup
  *      band probe (Dedup.incrementalMinhashFrom over `bands/`).
  *   2. DECIDE: accept = not an exact dup AND no historical band
  *      collision (the conservative firewall; a near-flag is cheap to
  *      re-adjudicate offline, a missed dup pollutes training data).
  *   3. REMEMBER: the ACCEPTED docs' fingerprints append to the store
  *      as new files (Fingerprints.append — history never read or
  *      rewritten), so the NEXT tick's gate sees them: a copy of a
  *      doc accepted in tick N is rejected in tick N+1 (spec).
  *
  * Everything corpus-sized stays where the component contracts put
  * it: the gates probe skinny store parquet (never history text), the
  * append writes only the shard's own fingerprints. Rejected docs
  * leave with their reasons (is_exact_dup / near_hist) — the audit
  * view, same philosophy as quality_filter's reason histogram.
  */
object Ingest {

  /** One tick: gate `shard` against the store at `storePath`, append
    * the accepted docs' fingerprints, return the per-doc decision
    * frame (doc_id, bloom_pass, is_exact_dup, n_hist_bands,
    * near_hist, accept).
    */
  def gateAndRemember(shard: DataFrame, storePath: String,
      nShards: Int = 1): DataFrame = {
    val s = shard.sparkSession
    val exact = graft.operators.Dedup.bloomGateFrom(shard,
      Fingerprints.readContent(s, storePath))
    val near = graft.operators.Dedup.incrementalMinhashFrom(shard,
      Fingerprints.readBands(s, storePath))
    val decided = exact
      .join(near.select(col("doc_id"), col("n_hist_bands"),
        col("near_hist")), Seq("doc_id"))
      .withColumn("accept",
        when(col("is_exact_dup") === 0L && col("near_hist") === 0L, 1L)
          .otherwise(0L))
      // the decision frame is consumed twice (append filter + the
      // caller's audit view) and the gates must not re-probe the store
      // after it has grown — pin it before the append mutates state
      .localCheckpoint()
    val accepted = shard.join(
      decided.filter(col("accept") === 1L).select(col("doc_id")),
      Seq("doc_id"))
    Fingerprints.append(accepted, storePath, nShards)
    decided
  }
}
