package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Ranking / retrieval evaluation and preference-data QC — the metrics
  * a retrieval stack and an annotation pipeline compute to grade
  * themselves (RlEval.scala grades ROLLOUTS; these ops grade RANKED
  * LISTS and RATER POOLS):
  *
  *   - eval_retrieval: per-query ranking metrics at K — MRR@K, hit@K,
  *     precision@K, and nDCG@K with graded relevance — the standard
  *     BEIR/MTEB report card, in exact integer ppm (the log2 discount
  *     enters as a fixed literal weight table, identical in both
  *     engines, so "nDCG needs floats" is false at fixed K).
  *   - pref_kappa: corpus-level Fleiss' kappa over the multi-annotator
  *     pool — the chance-corrected agreement number a labeling vendor
  *     is contractually held to (pref_agree reports per-item P_i;
  *     kappa is the corpus roll-up with the chance correction).
  *   - length_bias: the verbosity-bias audit over preference pairs —
  *     win rate of the LONGER response by length-gap bucket (reward
  *     models and annotators systematically favor longer answers; the
  *     AlpacaEval length-controlled line of work exists because this
  *     number is usually not 50%). A preference set whose longer-wins
  *     rate grows with the gap is teaching verbosity, not quality.
  *
  * Scale shape: eval_retrieval is two windows sharing one partitioning
  * keyed on query_id (partitions ≤ RankGroup rows, bounded by the
  * data model) into one groupBy — text never moves past its scan
  * (rel/rank are computed in the scan projection). pref_kappa is one
  * groupBy on item_id (≤ Raters-row groups) folded into ONE 1-row
  * aggregate. length_bias pairs WITHIN rollout groups only (≤ n², n =
  * CandidatesPerPrompt — bounded fan-out, never corpus×corpus) into a
  * ≤ GapBuckets-row output. All three outputs are skinny integers.
  */
object RankEval {

  /** Candidates per query (doc_id DIV 8 — wider than a GRPO group so
    * rank metrics at K=5 have headroom below the group size).
    */
  val RankGroup = 8

  /** Metrics cutoff K. */
  val RankK = 5

  /** DCG discount weights w(i) = floor(1e6 / log2(i+1)) for ranks
    * 1..K — FIXED LITERALS (not computed at runtime: double log could
    * land a hair under an exact value and floor one off), the same
    * table inlined into the Spark expression and the DuckDB oracle.
    */
  val DcgWeights: Seq[Long] = Seq(1000000L, 630929L, 500000L, 430676L, 386852L)
  require(DcgWeights.length == RankK)

  private def weightCase(rankCol: String): String =
    DcgWeights.zipWithIndex.map { case (w, i) =>
      s"WHEN $rankCol = ${i + 1} THEN $w"
    }.mkString("CASE ", " ", " ELSE 0 END")

  // gain(rel) = 2^rel − 1 over graded rel ∈ {0, 1, 2} → {0, 1, 3}
  private def gainCase(relCol: String): String =
    s"CASE WHEN $relCol = 2 THEN 3 WHEN $relCol = 1 THEN 1 ELSE 0 END"

  /** Ranked candidates derived from `documents` by fixed arithmetic:
    * query = doc_id DIV RankGroup, score = the dpo_pairs ranking
    * contract, graded relevance = the passk containment verdict
    * (answer token = first token of the query's lowest-id candidate;
    * contains → rel 1, contains with even n_chars → rel 2 — swap in
    * real qrels). The answer-source doc contains its own token, so
    * every query has ≥ 1 relevant candidate (the spec pins this).
    */
  def retrievalCands(s: SparkSession, dir: String): DataFrame = {
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "documents").select(
        expr(s"doc_id DIV $RankGroup").as("query_id"),
        col("doc_id"),
        (size(array_distinct(split(col("text"), " "))).cast("long") *
          100000L + col("n_chars")).as("score"),
        col("n_chars"), col("text"))
      .withColumn("answer",
        first(split(col("text"), " ").getItem(0)).over(byQuery))
      .select(col("query_id"), col("doc_id"), col("score"),
        when(instr(col("text"), col("answer")) > 0,
          lit(1L) + (lit(1L) - pmod(col("n_chars"), lit(2L))))
          .otherwise(0L).as("rel"))
  }

  private val candsCte = s"""
    WITH cands0 AS (
      SELECT doc_id // $RankGroup AS query_id, doc_id,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
          * 100000 + n_chars AS score,
        n_chars, text,
        FIRST_VALUE(string_split(text, ' ')[1]) OVER (
          PARTITION BY doc_id // $RankGroup ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS answer
      FROM documents),
    cands AS (
      SELECT query_id, doc_id, score,
        CASE WHEN strpos(text, answer) > 0
             THEN 1 + (1 - n_chars % 2) ELSE 0 END AS rel
      FROM cands0)"""

  // ---- eval_retrieval: MRR / hit / precision / nDCG at K ----
  // rank = the retriever's order (score DESC, doc_id ASC — the
  // dpo_pairs total order); ideal_rank = the oracle order (rel DESC,
  // doc_id ASC), which is what makes IDCG the ceiling DCG. Both
  // windows share the query_id partitioning, so one shuffle serves
  // both. precision@K divides by the FIXED K (the standard
  // definition — a 3-candidate query caps at 600000 ppm, documented).
  // MRR@K: reciprocal rank when the first relevant lands within K,
  // else 0. All divisions are truncating integer DIV, identical in
  // DuckDB (// truncates toward zero for integers, verified).
  /** Metrics over a (query_id, doc_id, score, rel) frame — factored
    * for fixture specs; the Op wires the documents derivation.
    */
  def evalRetrieval(cands: DataFrame): DataFrame = {
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val byRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id"))
    cands
      .withColumn("rank", row_number().over(byScore).cast("long"))
      .withColumn("ideal_rank", row_number().over(byRel).cast("long"))
      .withColumn("gain", expr(gainCase("rel")))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_cands"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel"),
        coalesce(min(when(col("rel") > 0, col("rank"))), lit(0L))
          .as("first_rel_rank"),
        max(when(col("rel") > 0 && col("rank") <= RankK, 1L)
          .otherwise(0L)).as("hit_k"),
        sum(when(col("rel") > 0 && col("rank") <= RankK, 1L)
          .otherwise(0L)).as("rel_in_k"),
        sum(expr(s"gain * (${weightCase("rank")})")).as("dcg_k"),
        sum(expr(s"gain * (${weightCase("ideal_rank")})")).as("idcg_k"))
      .select(col("query_id"), col("n_cands"), col("n_rel"),
        col("first_rel_rank"), col("hit_k"),
        expr(s"""CASE WHEN first_rel_rank >= 1 AND first_rel_rank <= $RankK
                 THEN 1000000 DIV first_rel_rank ELSE 0 END""")
          .as("mrr_ppm"),
        expr(s"(rel_in_k * 1000000) DIV $RankK").as("prec_k_ppm"),
        col("dcg_k"), col("idcg_k"),
        expr("""CASE WHEN idcg_k > 0 THEN (dcg_k * 1000000) DIV idcg_k
                ELSE 0 END""").as("ndcg_ppm"))
  }

  private val opEvalRetrieval = Op(
    "eval_retrieval",
    (s, dir) => evalRetrieval(retrievalCands(s, dir)),
    Some(candsCte + s""",
      ranked AS (
        SELECT query_id, doc_id, rel,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rel DESC, doc_id) AS BIGINT) AS ideal_rank,
          ${gainCase("rel")} AS gain
        FROM cands),
      m AS (
        SELECT query_id,
          COUNT(*) AS n_cands,
          SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_rel,
          COALESCE(MIN(CASE WHEN rel > 0 THEN rank END), 0)
            AS first_rel_rank,
          MAX(CASE WHEN rel > 0 AND rank <= $RankK THEN 1 ELSE 0 END)
            AS hit_k,
          SUM(CASE WHEN rel > 0 AND rank <= $RankK THEN 1 ELSE 0 END)
            AS rel_in_k,
          SUM(gain * (${weightCase("rank")})) AS dcg_k,
          SUM(gain * (${weightCase("ideal_rank")})) AS idcg_k
        FROM ranked GROUP BY query_id)
      SELECT query_id,
        CAST(n_cands AS BIGINT) AS n_cands,
        CAST(n_rel AS BIGINT) AS n_rel,
        CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
        CAST(hit_k AS BIGINT) AS hit_k,
        CAST(CASE WHEN first_rel_rank >= 1 AND first_rel_rank <= $RankK
          THEN 1000000 // first_rel_rank ELSE 0 END AS BIGINT) AS mrr_ppm,
        CAST((rel_in_k * 1000000) // $RankK AS BIGINT) AS prec_k_ppm,
        CAST(dcg_k AS BIGINT) AS dcg_k,
        CAST(idcg_k AS BIGINT) AS idcg_k,
        CAST(CASE WHEN idcg_k > 0 THEN (dcg_k * 1000000) // idcg_k
          ELSE 0 END AS BIGINT) AS ndcg_ppm
      FROM m"""))

  // ---- pref_kappa: corpus-level Fleiss' kappa ----
  // κ = (P̄ − P̄e) / (1 − P̄e): P̄ = mean per-item pairwise agreement
  // (the P_i pref_agree reports, items with ≥ 2 ratings), P̄e = the
  // chance agreement p₁² + p₀² from the GLOBAL label proportions over
  // the included items (the variable-rater generalization — classic
  // Fleiss assumes constant n, the P_i mean is the standard extension).
  // All in ppm: pe folds the squared proportions back by DIV 1e6;
  // kappa's numerator may be NEGATIVE (worse-than-chance panels) —
  // safe because both engines truncate integer division toward zero.
  // den = 0 (pe = 1e6: every rating one class — κ undefined, 0/0)
  // reports 0 by convention, documented here.
  /** One-row kappa over a (item_id, rater_id, label) frame — factored
    * for fixture specs; the Op wires the pref_agree derivation.
    */
  def fleissKappa(ratings: DataFrame): DataFrame =
    ratings.groupBy(col("item_id"))
      .agg(count(lit(1)).as("n_raters"), sum(col("label")).as("n_pos"))
      .where(col("n_raters") >= 2)
      .select(col("n_raters"), col("n_pos"),
        expr("""((n_pos * (n_pos - 1) +
                 (n_raters - n_pos) * (n_raters - n_pos - 1)) * 1000000)
                DIV (n_raters * (n_raters - 1))""").as("p_i_ppm"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_raters")).as("n_ratings"),
        sum(col("n_pos")).as("n_pos_total"),
        sum(col("p_i_ppm")).as("p_i_sum"))
      .select(col("n_items"), col("n_ratings"), col("n_pos_total"),
        expr("p_i_sum DIV n_items").as("pbar_ppm"),
        expr("(n_pos_total * 1000000) DIV n_ratings").as("p1_ppm"))
      .withColumn("pe_ppm",
        expr("""(p1_ppm * p1_ppm +
                (1000000 - p1_ppm) * (1000000 - p1_ppm)) DIV 1000000"""))
      .withColumn("kappa_ppm",
        expr("""CASE WHEN pe_ppm = 1000000 THEN 0
                ELSE ((pbar_ppm - pe_ppm) * 1000000) DIV (1000000 - pe_ppm)
                END"""))

  private val opPrefKappa = Op(
    "pref_kappa",
    (s, dir) => fleissKappa(Tables(s, dir, "documents").select(
      expr(s"doc_id DIV ${RlEval.Raters}").as("item_id"),
      expr(s"doc_id % ${RlEval.Raters}").as("rater_id"),
      expr("n_chars % 2").as("label"))),
    Some(s"""
      WITH ratings AS (
        SELECT doc_id // ${RlEval.Raters} AS item_id,
          doc_id % ${RlEval.Raters} AS rater_id, n_chars % 2 AS label
        FROM documents),
      t AS (
        SELECT item_id, COUNT(*) AS n_raters, SUM(label) AS n_pos
        FROM ratings GROUP BY item_id),
      pi AS (
        SELECT n_raters, n_pos,
          ((n_pos * (n_pos - 1) +
            (n_raters - n_pos) * (n_raters - n_pos - 1)) * 1000000)
            // (n_raters * (n_raters - 1)) AS p_i_ppm
        FROM t WHERE n_raters >= 2),
      agg AS (
        SELECT COUNT(*) AS n_items, SUM(n_raters) AS n_ratings,
          SUM(n_pos) AS n_pos_total, SUM(p_i_ppm) AS p_i_sum
        FROM pi),
      base AS (
        SELECT n_items, n_ratings, n_pos_total,
          p_i_sum // n_items AS pbar_ppm,
          (n_pos_total * 1000000) // n_ratings AS p1_ppm
        FROM agg),
      pe AS (
        SELECT *,
          (p1_ppm * p1_ppm +
           (1000000 - p1_ppm) * (1000000 - p1_ppm)) // 1000000 AS pe_ppm
        FROM base)
      SELECT CAST(n_items AS BIGINT) AS n_items,
        CAST(n_ratings AS BIGINT) AS n_ratings,
        CAST(n_pos_total AS BIGINT) AS n_pos_total,
        CAST(pbar_ppm AS BIGINT) AS pbar_ppm,
        CAST(p1_ppm AS BIGINT) AS p1_ppm,
        CAST(pe_ppm AS BIGINT) AS pe_ppm,
        CAST(CASE WHEN pe_ppm = 1000000 THEN 0
          ELSE ((pbar_ppm - pe_ppm) * 1000000) // (1000000 - pe_ppm)
          END AS BIGINT) AS kappa_ppm
      FROM pe"""))

  // ---- length_bias: verbosity-bias audit over preference pairs ----
  // Every pair within a rollout group (the bt_rating game derivation,
  // lengths carried), bucketed by |len(winner) − len(loser)| DIV
  // GapWidth capped at GapBuckets−1: per bucket, how often the LONGER
  // side won. Equal-length pairs are counted but excluded from the
  // rate's denominator (neither side is "longer"); an all-equal bucket
  // reports −1 (no rate exists), not a div-by-zero.
  val GapWidth = 100L
  val GapBuckets = 10L

  /** The audit over a (winner_chars, loser_chars) pair frame —
    * factored for fixture specs; the Op wires the rollout pairing.
    */
  def lengthBias(pairs: DataFrame): DataFrame =
    pairs
      .select(
        expr(s"""LEAST(abs(winner_chars - loser_chars) DIV $GapWidth,
                 ${GapBuckets - 1})""").as("gap_bucket"),
        when(col("winner_chars") > col("loser_chars"), 1L)
          .otherwise(0L).as("longer_won"),
        when(col("winner_chars") === col("loser_chars"), 1L)
          .otherwise(0L).as("equal_len"))
      .groupBy(col("gap_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("longer_won")).as("n_longer_wins"),
        sum(col("equal_len")).as("n_equal_len"))
      .select(col("gap_bucket"),
        (col("gap_bucket") * GapWidth).as("gap_lo"),
        col("n_pairs"), col("n_longer_wins"), col("n_equal_len"),
        expr("""CASE WHEN n_pairs - n_equal_len = 0 THEN -1
                ELSE (n_longer_wins * 1000000) DIV (n_pairs - n_equal_len)
                END""").as("longer_win_ppm"))

  /** Preference pairs with lengths: every unordered pair within a
    * rollout group, winner by the (score DESC, doc_id ASC) total order.
    */
  def rolloutPairsWithLen(scored: DataFrame): DataFrame = {
    val a = scored.select(col("prompt_id"), col("doc_id").as("a_doc"),
      col("score").as("a_s"), col("n_chars").as("a_c"))
    val b = scored.select(col("prompt_id"), col("doc_id").as("b_doc"),
      col("score").as("b_s"), col("n_chars").as("b_c"))
    a.join(b, "prompt_id").where(col("a_doc") < col("b_doc"))
      .select(
        when(col("a_s") >= col("b_s"), col("a_c")).otherwise(col("b_c"))
          .as("winner_chars"),
        when(col("a_s") >= col("b_s"), col("b_c")).otherwise(col("a_c"))
          .as("loser_chars"))
  }

  private def scoredWithLen(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      expr(s"doc_id DIV ${RlEval.CandidatesPerPrompt}").as("prompt_id"),
      col("doc_id"),
      (size(array_distinct(split(col("text"), " "))).cast("long") *
        100000L + col("n_chars")).as("score"),
      col("n_chars"))

  private val opLengthBias = Op(
    "length_bias",
    (s, dir) => lengthBias(rolloutPairsWithLen(scoredWithLen(s, dir))),
    Some(s"""
      WITH scored AS (
        SELECT doc_id // ${RlEval.CandidatesPerPrompt} AS prompt_id, doc_id,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            * 100000 + n_chars AS score,
          n_chars
        FROM documents),
      pairs AS (
        SELECT
          CASE WHEN a.score >= b.score THEN a.n_chars ELSE b.n_chars END
            AS winner_chars,
          CASE WHEN a.score >= b.score THEN b.n_chars ELSE a.n_chars END
            AS loser_chars
        FROM scored a JOIN scored b USING (prompt_id)
        WHERE a.doc_id < b.doc_id),
      bucketed AS (
        SELECT
          LEAST(abs(winner_chars - loser_chars) // $GapWidth,
            ${GapBuckets - 1}) AS gap_bucket,
          CASE WHEN winner_chars > loser_chars THEN 1 ELSE 0 END
            AS longer_won,
          CASE WHEN winner_chars = loser_chars THEN 1 ELSE 0 END
            AS equal_len
        FROM pairs),
      agg AS (
        SELECT gap_bucket, COUNT(*) AS n_pairs,
          SUM(longer_won) AS n_longer_wins,
          SUM(equal_len) AS n_equal_len
        FROM bucketed GROUP BY gap_bucket)
      SELECT CAST(gap_bucket AS BIGINT) AS gap_bucket,
        CAST(gap_bucket * $GapWidth AS BIGINT) AS gap_lo,
        CAST(n_pairs AS BIGINT) AS n_pairs,
        CAST(n_longer_wins AS BIGINT) AS n_longer_wins,
        CAST(n_equal_len AS BIGINT) AS n_equal_len,
        CAST(CASE WHEN n_pairs - n_equal_len = 0 THEN -1
          ELSE (n_longer_wins * 1000000) // (n_pairs - n_equal_len)
          END AS BIGINT) AS longer_win_ppm
      FROM agg"""))

  val ops: Seq[Op] = Seq(opEvalRetrieval, opPrefKappa, opLengthBias)
}
