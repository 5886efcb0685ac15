package graft.operators

import graft.{Op, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** curate_e2e — the full training-data curation decision, end-to-end
  * (SURVEY.md §2): the chain every individual gate exists FOR, wired
  * the way dedup_pipeline wired the dedup stages. The reference's end
  * state is curated, chunked documents feeding its map-reduce pipeline
  * (reference datasets/parse.py sectioning → test_proactive.py:152
  * rechunk); this operator is the decision record of the curation that
  * precedes that hand-off at corpus scale. One row per INPUT doc with
  * its disposition:
  *
  *   quality_filter keep-set  → near-dup dedup_pipeline keepers
  *     → sample_temperature mix  → seq_pack training manifest
  *
  * `stage` names the FIRST stage that dropped the doc
  * ("quality" | "dedup" | "mix") or "kept"; kept docs carry their
  * packed-sequence coordinates (n_seqs, first_seq). Grouping by
  * `stage` is the per-stage drop accounting a curation dashboard
  * shows; the kept rows are the training-set manifest a loader reads
  * (join seq_pack's fragment rows for exact offsets).
  *
  * Scale shape — the corpus TEXT moves at most once across the whole
  * chain (spec-asserted; with statistics flowing it moves ZERO times):
  *  - quality_filter: narrow scan + skinny repetition shuffles (its
  *    own no-text-exchange contract);
  *  - survivor texts: the corpus scan broadcast-filtered by the
  *    skinny quality keep-set — a semi-join against a checkpointed
  *    tiny frame, no text exchange;
  *  - dedup_pipeline: its own bounded shapes (banded candidates,
  *    checkpoint-stat-driven broadcasts for the rep/candidate gathers);
  *  - mix + pack: skinny (doc_id, source, n_toks) frames only —
  *    broadcast-joined tiny aggregates and the 3-level PrefixSum.
  */
object Curate {

  /** Intermediate stage frames, exposed so specs can audit each
    * stage's plan and the stage-by-stage drop sets independently.
    */
  private[graft] case class CurateStages(
      qf: DataFrame,        // doc_id, qf_reason, qf_keep — all input docs
      survivors: DataFrame, // quality keepers WITH text (checkpointed)
      dd: DataFrame,        // doc_id, cluster_id, is_keeper — survivors
      mixKept: DataFrame,   // doc_id, temp_hash — docs kept by the mix
      manifest: DataFrame)  // one row per input doc

  private[graft] def curateStages(d: DataFrame,
      seqLen: Long = Sampling.SeqLen): CurateStages = {
    // stage 1: quality gate — skinny per-doc decisions, no text in any
    // exchange. LAZILY checkpointed so ONE job both materializes the
    // checkpoint AND measures the keep-set for the guard: the old
    // shape paid an eager-checkpoint job plus a separate
    // keepIds.count() guard job; the skinny groupBy(qf_keep) aggregate
    // below computes the qf partitions (checkpointing them as it goes)
    // and returns the same measured count.
    val qf = TextAnalysis.qualityFilter(d)
      .select(col("doc_id"), col("reason").as("qf_reason"),
        col("keep").as("qf_keep"))
      .localCheckpoint(eager = false)
    val nKeep = qf.groupBy(col("qf_keep")).count().collect()
      .collectFirst { case r if r.getLong(0) == 1L => r.getLong(1) }
      .getOrElse(0L)
    // survivor texts = the corpus scan filtered by the skinny keep-set,
    // with the keep-set side under a counted broadcast guard (the
    // dedup_span pattern): its MEASURED count — not a checkpoint's
    // unknown statistics — decides broadcast vs shuffled-hash. Under
    // the bound the text crosses no exchange at all; above it this is
    // the chain's ONE text move. Materialized once: every downstream
    // consumer (dedup's groups/reps/ssets, the skinny projection)
    // reads the blocks instead of re-running the corpus scan.
    val keepIds = qf.filter(col("qf_keep") === 1L).select("doc_id")
    val keepSide =
      if (nKeep <= Dedup.SpanBroadcastMaxRows) broadcast(keepIds)
      else keepIds.hint("shuffle_hash")
    val survivors = d.join(keepSide, Seq("doc_id")).localCheckpoint()
    // stage 2: near-dup clustering over quality survivors
    val dd = Dedup.dedupPipeline(survivors.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("cluster_id"), col("is_keeper"))
    // skinny from here on: source + token count computed narrowly ONCE
    // off the materialized survivors — text never joins again
    val skinny = survivors.select(col("doc_id"), col("source"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_toks"))
    val ddKept = skinny.join(dd, Seq("doc_id"))
      .filter(col("is_keeper") === 1L)
      .localCheckpoint() // feeds the mix counts, the pack, and the manifest
    // stage 3: temperature mix over dedup keepers (α = 1/2, exact)
    val mixKept = Sampling
      .sampleTemperature(ddKept.select(col("doc_id"), col("source")))
      .select(col("doc_id"), col("temp_hash"))
    // stage 4: pack the final keep set into training sequences
    val packed = Sampling.packCounts(
      ddKept.join(mixKept.select("doc_id"), Seq("doc_id"))
        .select(col("doc_id"), col("n_toks").as("n_tokens")), seqLen)
    val perDocPack = packed.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_seqs"), min(col("seq_id")).as("first_seq"))
    // manifest: disposition per input doc + packing coordinates
    val manifest = d.select(col("doc_id"), col("source"))
      .join(qf, Seq("doc_id"))
      .join(dd, Seq("doc_id"), "left")
      .join(mixKept, Seq("doc_id"), "left")
      .join(perDocPack, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("qf_keep") === 0L, "quality")
          .when(col("is_keeper") === 0L, "dedup")
          .when(col("temp_hash").isNull, "mix")
          .otherwise("kept").as("stage"),
        col("qf_reason"),
        coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"),
        coalesce(col("n_seqs"), lit(0L)).as("n_seqs"),
        coalesce(col("first_seq"), lit(-1L)).as("first_seq"))
    CurateStages(qf, survivors, dd, mixKept, manifest)
  }

  private[graft] def curateE2e(d: DataFrame,
      seqLen: Long = Sampling.SeqLen): DataFrame =
    curateStages(d, seqLen).manifest

  private val opCurate = Op(
    "curate_e2e",
    (s, dir) => {
      graft.plans.GraftFunctions.register(s)
      curateE2e(Tables(s, dir, "documents"))
    },
    None) // dedup_pipeline inside is not SQL-expressible → rows-only +
          // planted-fixture spec (one doc dropped per stage)

  val ops: Seq[Op] = Seq(opCurate)
}
