package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** RL / evaluation data preparation — the reward side of post-training
  * (PostTrain.scala covers the SFT/preference-pair side; these ops
  * cover what an RL fine-tuning and eval stack computes from scored
  * rollouts). Five surfaces:
  *
  *   - grpo_adv: group-relative advantages over rollout groups (the
  *     GRPO mean-baseline estimator, plus the RLOO leave-one-out
  *     variant) — exact integer arithmetic, no float normalization.
  *   - kto_labels: binary desirable/undesirable labels vs the prompt
  *     mean with inverse-class-frequency weights (the KTO data shape).
  *   - eval_passk: the unbiased pass@k estimator (Chen et al. 2021,
  *     the HumanEval formula) from n samples / c correct per task —
  *     exact rational combinatorics in BIGINT, k fixed small.
  *   - pref_agree: multi-annotator agreement per item — majority
  *     label, unanimity, and the per-item Fleiss P_i pairwise
  *     agreement in exact ppm.
  *   - bt_rating: Bradley–Terry strengths over pairwise game outcomes
  *     (the arena-leaderboard fit) via the MM update iterated a fixed
  *     number of rounds in INTEGER fixed-point — the graph_pagerank
  *     move, so the float-iterative fit becomes a full DuckDB oracle
  *     instead of a rows-only spec.
  *
  * Scale shape, per op: grpo_adv / kto_labels / eval_passk /
  * pref_agree are each ONE window or groupBy keyed on the group id —
  * partitions are single rollout groups (≤ CandidatesPerPrompt rows,
  * bounded by the data model, never by corpus size); outputs are
  * skinny integer rows, text never moves past its scan. bt_rating
  * aggregates games once to a (model, model) win matrix — volume =
  * distinct model pairs, not games — then iterates over model-sized
  * frames only (BtIters joins of skinny rating rows; per-iteration
  * localCheckpoint cuts the lineage, the pagerank discipline). The
  * win-count pre-scaling (BtMaxWins) keeps every intermediate product
  * inside BIGINT at any game volume — counts quantize, ratios hold.
  *
  * The rollout score reuses dpo_pairs' ranking CONTRACT (distinct
  * tokens dominant, n_chars tiebreak — swap in any trained reward
  * model); reference provenance for the scoring convention:
  * hanchen_recomp.py:55-97 (the reference scores candidate outputs
  * against references; these ops consume such scores).
  */
object RlEval {

  /** Rollouts per prompt group (doc_id DIV 4 — the PostTrain
    * convention; a GRPO group is complete at exactly this many).
    */
  val CandidatesPerPrompt = 4

  /** Distinct model ids for bt_rating's game derivation (doc_id % 7 —
    * coprime with the group width so every group's rollouts come from
    * distinct models and the comparison graph is connected).
    */
  val BtModels = 7

  // Scored rollouts derived from `documents` by fixed arithmetic —
  // prompt_id groups of CandidatesPerPrompt, the dpo_pairs score.
  private def rollouts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      expr(s"doc_id DIV $CandidatesPerPrompt").as("prompt_id"),
      col("doc_id"),
      expr(s"doc_id % $BtModels").as("model_id"),
      (size(array_distinct(split(col("text"), " "))).cast("long") *
        100000L + col("n_chars")).as("score"),
      col("text"))

  private val rolloutsCte = s"""
    WITH rollouts AS (
      SELECT doc_id // $CandidatesPerPrompt AS prompt_id, doc_id,
        doc_id % $BtModels AS model_id,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
          * 100000 + n_chars AS score,
        text
      FROM documents)"""

  // ---- grpo_adv: group-relative advantage estimation ----
  // GRPO's advantage is the reward centered on its own rollout
  // group's mean (no critic, no global baseline); the Dr.GRPO variant
  // drops the per-group std division, which is exactly what keeps the
  // estimator EXACT here: adv = r − mean(group) scales to integers as
  // (n·r − S)·1e6 DIV n ppm — order-free sums, no float anywhere.
  // RLOO's baseline is the mean of the OTHER rollouts: (S − r)/(n−1),
  // the unbiased leave-one-out form, same integer treatment. Groups
  // of one are dropped (no baseline exists — both estimators need a
  // second rollout). One window keyed on prompt_id, ≤ 4-row
  // partitions; per-group advantage mass telescopes to zero by
  // construction (Σ(n·r − S) = 0), which the spec pins.
  /** Advantages over a (prompt_id, doc_id, score) frame — factored
    * for fixture specs; the Op wires the documents scoring.
    */
  def grpoAdv(scored: DataFrame): DataFrame = {
    val byPrompt = Window.partitionBy(col("prompt_id"))
    scored
      .withColumn("n_group", count(lit(1)).over(byPrompt))
      .withColumn("sum_score", sum(col("score")).over(byPrompt))
      .where(col("n_group") >= 2)
      .select(col("prompt_id"), col("doc_id"), col("score"),
        col("n_group"),
        expr("((n_group * score - sum_score) * 1000000) DIV n_group")
          .as("adv_ppm"),
        expr("""((score * (n_group - 1) - (sum_score - score)) * 1000000)
                DIV (n_group - 1)""").as("adv_rloo_ppm"))
  }

  private val opGrpoAdv = Op(
    "grpo_adv",
    (s, dir) => grpoAdv(rollouts(s, dir)),
    Some(rolloutsCte + """,
      g AS (
        SELECT prompt_id, doc_id, score,
          COUNT(*) OVER (PARTITION BY prompt_id) AS n_group,
          SUM(score) OVER (PARTITION BY prompt_id) AS sum_score
        FROM rollouts)
      SELECT prompt_id, doc_id, score,
        CAST(n_group AS BIGINT) AS n_group,
        CAST(((n_group * score - sum_score) * 1000000) // n_group
          AS BIGINT) AS adv_ppm,
        CAST(((score * (n_group - 1) - (sum_score - score)) * 1000000)
          // (n_group - 1) AS BIGINT) AS adv_rloo_ppm
      FROM g WHERE n_group >= 2"""))

  // ---- kto_labels: binary feedback labels + class-balance weights --
  // KTO trains from unpaired binary feedback (desirable /
  // undesirable), not preference pairs; the label here is the
  // deterministic contract "above the prompt group's mean" compared
  // EXACTLY as n·r > S (no division), and each example carries the
  // inverse-class-frequency weight w = n/(2·|own class|) in ppm — the
  // balancing KTO's λ_D/λ_U serve, computed per prompt so a skewed
  // group reweights itself. Singleton groups keep label 0 (r > r is
  // false) and weight n/(2n) — harmless, documented. One window,
  // skinny output.
  /** Labels over a (prompt_id, doc_id, score) frame — factored for
    * fixture specs; the Op wires the documents scoring.
    */
  def ktoLabels(scored: DataFrame): DataFrame = {
    val byPrompt = Window.partitionBy(col("prompt_id"))
    scored
      .withColumn("n_group", count(lit(1)).over(byPrompt))
      .withColumn("sum_score", sum(col("score")).over(byPrompt))
      .withColumn("desirable",
        when(col("n_group") * col("score") > col("sum_score"), 1L)
          .otherwise(0L))
      .withColumn("n_pos", sum(col("desirable")).over(byPrompt))
      .select(col("prompt_id"), col("doc_id"), col("score"),
        col("desirable"), col("n_group"), col("n_pos"),
        (col("n_group") - col("n_pos")).as("n_neg"),
        expr("""(n_group * 1000000) DIV
                (2 * CASE WHEN desirable = 1 THEN n_pos
                          ELSE n_group - n_pos END)""").as("w_ppm"))
  }

  private val opKtoLabels = Op(
    "kto_labels",
    (s, dir) => ktoLabels(rollouts(s, dir)),
    Some(rolloutsCte + """,
      g AS (
        SELECT prompt_id, doc_id, score,
          COUNT(*) OVER (PARTITION BY prompt_id) AS n_group,
          SUM(score) OVER (PARTITION BY prompt_id) AS sum_score
        FROM rollouts),
      lab AS (
        SELECT prompt_id, doc_id, score, n_group,
          CASE WHEN n_group * score > sum_score THEN 1 ELSE 0 END
            AS desirable
        FROM g),
      cls AS (
        SELECT prompt_id, doc_id, score, desirable, n_group,
          SUM(desirable) OVER (PARTITION BY prompt_id) AS n_pos
        FROM lab)
      SELECT prompt_id, doc_id, score,
        CAST(desirable AS BIGINT) AS desirable,
        CAST(n_group AS BIGINT) AS n_group,
        CAST(n_pos AS BIGINT) AS n_pos,
        CAST(n_group - n_pos AS BIGINT) AS n_neg,
        CAST((n_group * 1000000) //
          (2 * CASE WHEN desirable = 1 THEN n_pos
                    ELSE n_group - n_pos END) AS BIGINT) AS w_ppm
      FROM cls"""))

  // ---- eval_passk: the unbiased pass@k estimator ----
  // The HumanEval/Codex estimator (Chen et al. 2021): with n samples
  // per task of which c pass, pass@k = 1 − C(n−c,k)/C(n,k) — the
  // probability at least one of k drawn samples passes, unbiased
  // unlike the naive min(1, c·k/n). k = PassK fixed small, so the
  // binomial ratio is a LITERAL product of k rational factors — exact
  // BIGINT numerator/denominator, result in truncated ppm, identical
  // arithmetic in both engines. "Pass" here is the deterministic
  // contract: the sample contains its task's answer token (the first
  // token of the task's lowest-id rollout — score_em_substr's
  // containment family); swap in any unit-test harness verdict. Two
  // windows sharing one (task) partitioning + one groupBy; tasks with
  // n < k are dropped (the estimator is undefined there).
  val PassK = 2

  /** pass@k over a (task_id, correct) frame (correct ∈ {0,1}) —
    * factored for fixture specs and the streaming twin; the Op wires
    * the documents containment verdict.
    */
  def evalPassk(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("task_id"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("correct")).as("n_correct"))
      .where(col("n_samples") >= PassK)
      .select(col("task_id"), col("n_samples"), col("n_correct"),
        expr("(n_correct * 1000000) DIV n_samples").as("pass1_ppm"),
        expr("""1000000 -
          (greatest(n_samples - n_correct, 0) *
           greatest(n_samples - n_correct - 1, 0) * 1000000) DIV
          (n_samples * (n_samples - 1))""").as("passk_ppm"))

  /** The containment verdict over rollouts: answer = first token of
    * the task's lowest-id sample; correct = sample text contains it.
    */
  def passkVerdicts(scored: DataFrame): DataFrame = {
    val byTask = Window.partitionBy(col("task_id")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored
      .withColumn("answer", first(split(col("text"), " ").getItem(0))
        .over(byTask))
      .select(col("task_id"), col("doc_id"),
        when(instr(col("text"), col("answer")) > 0, 1L).otherwise(0L)
          .as("correct"))
  }

  private val opEvalPassk = Op(
    "eval_passk",
    (s, dir) => evalPassk(passkVerdicts(
      rollouts(s, dir).withColumnRenamed("prompt_id", "task_id"))),
    Some(rolloutsCte + s""",
      v AS (
        SELECT prompt_id AS task_id, doc_id, text,
          FIRST_VALUE(string_split(text, ' ')[1]) OVER (
            PARTITION BY prompt_id ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS answer
        FROM rollouts),
      c AS (
        SELECT task_id,
          CASE WHEN strpos(text, answer) > 0 THEN 1 ELSE 0 END AS correct
        FROM v),
      t AS (
        SELECT task_id, COUNT(*) AS n_samples, SUM(correct) AS n_correct
        FROM c GROUP BY task_id)
      SELECT task_id,
        CAST(n_samples AS BIGINT) AS n_samples,
        CAST(n_correct AS BIGINT) AS n_correct,
        CAST((n_correct * 1000000) // n_samples AS BIGINT) AS pass1_ppm,
        CAST(1000000 -
          (GREATEST(n_samples - n_correct, 0) *
           GREATEST(n_samples - n_correct - 1, 0) * 1000000) //
          (n_samples * (n_samples - 1)) AS BIGINT) AS passk_ppm
      FROM t WHERE n_samples >= $PassK"""))

  // ---- pref_agree: multi-annotator agreement per item ----
  // Preference data quality control: each item is rated by Raters
  // annotators (rater = doc_id % Raters, item = doc_id DIV Raters; the
  // binary label is the deterministic contract n_chars % 2 — swap in
  // real annotator verdicts). Per item: positive votes, the majority
  // label (ties resolve to 1, documented), unanimity, and the
  // per-item Fleiss P_i — the fraction of AGREEING annotator pairs,
  // (p(p−1) + q(q−1)) / (n(n−1)) in exact ppm — the quantity Fleiss'
  // kappa averages before chance correction. Items with one rating
  // are dropped (no pair exists). One groupBy on item_id, ≤
  // Raters-row groups, skinny integer output.
  val Raters = 5

  /** Agreement over a (item_id, rater_id, label) frame — factored for
    * fixture specs; the Op wires the documents derivation.
    */
  def prefAgree(ratings: DataFrame): DataFrame =
    ratings.groupBy(col("item_id"))
      .agg(count(lit(1)).as("n_raters"), sum(col("label")).as("n_pos"))
      .where(col("n_raters") >= 2)
      .select(col("item_id"), col("n_raters"), col("n_pos"),
        when(col("n_pos") * 2 >= col("n_raters"), 1L).otherwise(0L)
          .as("majority"),
        when(col("n_pos") === 0L || col("n_pos") === col("n_raters"), 1L)
          .otherwise(0L).as("unanimous"),
        expr("""((n_pos * (n_pos - 1) +
                 (n_raters - n_pos) * (n_raters - n_pos - 1)) * 1000000)
                DIV (n_raters * (n_raters - 1))""").as("agree_ppm"))

  private val opPrefAgree = Op(
    "pref_agree",
    (s, dir) => prefAgree(Tables(s, dir, "documents").select(
      expr(s"doc_id DIV $Raters").as("item_id"),
      expr(s"doc_id % $Raters").as("rater_id"),
      expr("n_chars % 2").as("label"))),
    Some(s"""
      WITH ratings AS (
        SELECT doc_id // $Raters AS item_id, doc_id % $Raters AS rater_id,
          n_chars % 2 AS label
        FROM documents),
      t AS (
        SELECT item_id, COUNT(*) AS n_raters, SUM(label) AS n_pos
        FROM ratings GROUP BY item_id)
      SELECT item_id,
        CAST(n_raters AS BIGINT) AS n_raters,
        CAST(n_pos AS BIGINT) AS n_pos,
        CAST(CASE WHEN n_pos * 2 >= n_raters THEN 1 ELSE 0 END AS BIGINT)
          AS majority,
        CAST(CASE WHEN n_pos = 0 OR n_pos = n_raters THEN 1 ELSE 0 END
          AS BIGINT) AS unanimous,
        CAST(((n_pos * (n_pos - 1) +
               (n_raters - n_pos) * (n_raters - n_pos - 1)) * 1000000)
          // (n_raters * (n_raters - 1)) AS BIGINT) AS agree_ppm
      FROM t WHERE n_raters >= 2"""))

  // ---- bt_rating: Bradley–Terry strengths (arena leaderboard) ----
  // Pairwise game outcomes (within each rollout group, every pair of
  // samples is a game; the higher (score, doc_id ASC) wins — the
  // dpo_pairs total order) fit with the Bradley–Terry model via the
  // MM update p_i ← W_i / Σ_j n_ij/(p_i+p_j), iterated BtIters
  // rounds in INTEGER fixed-point (scale BtScale) and renormalized to
  // mean BtScale each round — the graph_pagerank discipline, which is
  // what makes an "iterative float fit" a full DuckDB oracle: every
  // division is a truncating BIGINT DIV evaluated identically in both
  // engines (Long sums are exact and order-free, so no arrival or
  // partition order can perturb a single bit).
  //
  // Scale split: the CORPUS-scale work — reducing billions of games to
  // the directed win matrix — is a distributed groupBy (volume =
  // distinct model PAIRS, not games). The FIT is a fixed-point loop
  // over that leaderboard-sized matrix; running it as 20 rounds of
  // DataFrame joins pays ~20 job launches + shuffles to move a few
  // thousand skinny rows (measured 42 s at sf0.1 vs 4.8 s for the
  // next-slowest query), so the fit runs as ONE single-task
  // mapPartitions kernel under a COUNTED guard (BtMaxPairs — the
  // repo's discipline for driver-bounded loops: bpe_train's top-64k,
  // mine_hardneg's counted broadcasts): 2·10⁷ pair rows × 32 bytes ≈
  // 640 MB worst-case in one task, far above any real leaderboard
  // (1e6 models × sparse opposition), and the guard REFUSES rather
  // than degrade when the bound is exceeded.
  //
  // Overflow is bounded twice: win counts pre-scale by max(1, maxW
  // DIV BtMaxWins) — BT is invariant under uniform count scaling, so
  // at any game volume W·S² ≤ 1e18 (counts quantize ratio-preserving;
  // n/W are re-derived from the SCALED wins so the MM invariant
  // W_i = Σ_j w_ij holds) — and the renormalization divides the total
  // by m FIRST (p ← praw·S DIV (tot DIV m)), keeping praw·S ≤ 2m·S²
  // inside BIGINT up to m ≈ 4.6e6 models (praw ≤ 2mS because den_i ≥
  // games_i·(S² DIV 2mS) under the mean-S normalization).
  val BtIters = 20
  val BtScale = 1000000L
  val BtMaxWins = 1000000L
  val BtMaxPairs = 20000000L

  /** Ratings over a (winner_m, loser_m) game frame — factored for
    * fixture specs; the Op wires the rollout-group game derivation.
    */
  def btRating(games: DataFrame): DataFrame = {
    val spark = games.sparkSession
    import spark.implicits._
    val dirWins = games.where(col("winner_m") =!= col("loser_m"))
      .groupBy(col("winner_m").as("i"), col("loser_m").as("j"))
      .agg(count(lit(1)).as("w_raw"))
      .localCheckpoint()
    val maxW = dirWins.groupBy(col("i")).agg(sum(col("w_raw")).as("wi"))
      .agg(coalesce(max(col("wi")), lit(0L)).as("mw"))
    val scaled = dirWins.crossJoin(broadcast(maxW))
      .select(col("i"), col("j"),
        expr(s"w_raw DIV greatest(mw DIV $BtMaxWins, 1)").as("w"))
      .where(col("w") > 0)
    val sym = scaled.select(col("i"), col("j"), col("w").as("wf"),
        lit(0L).as("wb"))
      .union(scaled.select(col("j").as("i"), col("i").as("j"),
        lit(0L).as("wf"), col("w").as("wb")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("wf")).as("w_ij"), sum(col("wb")).as("w_ji"))
      .withColumn("n_ij", col("w_ij") + col("w_ji"))
      .localCheckpoint()
    // counts below are the SCALED wins (identical to raw whenever the
    // corpus is under BtMaxWins games per model — all test scales)
    val wtab = sym.groupBy(col("i"))
      .agg(sum(col("w_ij")).as("wins"), sum(col("n_ij")).as("games"))
    val nPairs = sym.count() // counted guard BEFORE the single-task fit
    require(nPairs <= BtMaxPairs,
      s"bt_rating: $nPairs directed model pairs exceed the single-task " +
        s"fit bound $BtMaxPairs — shard the leaderboard (fit per shard, " +
        "rescale on the overlap) or raise BtMaxPairs")
    val (iters, scale, s2) = (BtIters, BtScale, BtScale * BtScale)
    val ratings = sym.select(col("i"), col("j"), col("w_ij"), col("n_ij"))
      .as[(Long, Long, Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val models = rows.map(_._1).distinct
          val m = models.length.toLong
          val wins = new scala.collection.mutable.HashMap[Long, Long]()
          rows.foreach { case (i, _, w, _) =>
            wins.update(i, wins.getOrElse(i, 0L) + w)
          }
          var p: Map[Long, Long] = models.map(_ -> scale).toMap
          for (_ <- 1 to iters) {
            val den = new scala.collection.mutable.HashMap[Long, Long]()
            rows.foreach { case (i, j, _, nij) =>
              den.update(i, den.getOrElse(i, 0L) +
                nij * (s2 / math.max(p(i) + p(j), 1L)))
            }
            val praw = models.map(i =>
              i -> (wins.getOrElse(i, 0L) * s2) /
                math.max(den.getOrElse(i, 0L), 1L))
            val tot = praw.map(_._2).sum // exact Long sum, order-free
            p = praw.map { case (i, v) =>
              i -> (v * scale) / math.max(tot / m, 1L)
            }.toMap
          }
          models.iterator.map(i => (i, p(i)))
        }
      }
      .toDF("i", "r")
    ratings.join(wtab, "i")
      .select(col("i").as("model_id"), col("r").as("rating_fp"),
        col("games").as("n_games"), col("wins").as("n_wins"))
  }

  /** Game derivation: every ordered pair within a rollout group, the
    * (score DESC, doc_id ASC) total order picks the winner.
    */
  def rolloutGames(scored: DataFrame): DataFrame = {
    val a = scored.select(col("prompt_id"), col("doc_id").as("a_doc"),
      col("model_id").as("a_m"), col("score").as("a_s"))
    val b = scored.select(col("prompt_id"), col("doc_id").as("b_doc"),
      col("model_id").as("b_m"), col("score").as("b_s"))
    a.join(b, "prompt_id").where(col("a_doc") < col("b_doc"))
      .select(
        when(col("a_s") >= col("b_s"), col("a_m"))
          .otherwise(col("b_m")).as("winner_m"),
        when(col("a_s") >= col("b_s"), col("b_m"))
          .otherwise(col("a_m")).as("loser_m"))
  }

  // every iteration CTE is MATERIALIZED: DuckDB inlines plain CTEs,
  // and bt$t references bt${t-1} twice (both game endpoints), so
  // un-materialized the 20-step chain expands 2^20-fold — the oracle
  // must pin linear evaluation, exactly like the Spark side's
  // per-iteration localCheckpoint.
  private def btIterSql(t: Int): String = {
    val prev = if (t == 1) "bt0" else s"bt${t - 1}"
    s"""btraw$t AS MATERIALIZED (
        SELECT w.i,
          (w.wins * ${BtScale * BtScale}) // GREATEST(d.den, 1) AS praw
        FROM wtab w JOIN (
          SELECT f.i,
            SUM(f.n_ij * (${BtScale * BtScale} //
              GREATEST(pi.r + pj.r, 1))) AS den
          FROM sym f
          JOIN $prev pi ON f.i = pi.i
          JOIN $prev pj ON f.j = pj.i
          GROUP BY f.i) d ON w.i = d.i),
      bt$t AS MATERIALIZED (
        SELECT r1.i,
          CAST((r1.praw * $BtScale) // GREATEST(t.tot // t.m, 1)
            AS BIGINT) AS r
        FROM btraw$t r1 CROSS JOIN
          (SELECT SUM(praw) AS tot, COUNT(*) AS m FROM btraw$t) t)"""
  }

  private val opBtRating = Op(
    "bt_rating",
    (s, dir) => btRating(rolloutGames(rollouts(s, dir))),
    Some(rolloutsCte + s""",
      a AS (SELECT prompt_id, doc_id AS a_doc, model_id AS a_m,
              score AS a_s FROM rollouts),
      b AS (SELECT prompt_id, doc_id AS b_doc, model_id AS b_m,
              score AS b_s FROM rollouts),
      games AS MATERIALIZED (
        SELECT
          CASE WHEN a_s >= b_s THEN a_m ELSE b_m END AS winner_m,
          CASE WHEN a_s >= b_s THEN b_m ELSE a_m END AS loser_m
        FROM a JOIN b USING (prompt_id) WHERE a_doc < b_doc),
      dirwins AS MATERIALIZED (
        SELECT winner_m AS i, loser_m AS j,
          CAST(COUNT(*) AS BIGINT) AS w_raw
        FROM games WHERE winner_m <> loser_m GROUP BY 1, 2),
      mw AS MATERIALIZED (
        SELECT COALESCE(MAX(wi), 0) AS mw FROM (
          SELECT i, SUM(w_raw) AS wi FROM dirwins GROUP BY i)),
      scaled AS MATERIALIZED (
        SELECT i, j, w_raw // GREATEST(mw // $BtMaxWins, 1) AS w, w_raw
        FROM dirwins CROSS JOIN mw
        WHERE w_raw // GREATEST(mw // $BtMaxWins, 1) > 0),
      sym AS MATERIALIZED (
        SELECT i, j, SUM(wf) AS w_ij, SUM(wb) AS w_ji,
          SUM(wf) + SUM(wb) AS n_ij
        FROM (
          SELECT i, j, w AS wf, 0 AS wb FROM scaled
          UNION ALL
          SELECT j AS i, i AS j, 0 AS wf, w AS wb FROM scaled)
        GROUP BY i, j),
      wtab AS MATERIALIZED (
        SELECT i, CAST(SUM(w_ij) AS BIGINT) AS wins,
          CAST(SUM(n_ij) AS BIGINT) AS games
        FROM sym GROUP BY i),
      bt0 AS MATERIALIZED (SELECT i, CAST($BtScale AS BIGINT) AS r FROM wtab),
      ${(1 to BtIters).map(btIterSql).mkString(",\n      ")}
      SELECT p.i AS model_id, p.r AS rating_fp,
        w.games AS n_games, w.wins AS n_wins
      FROM bt$BtIters p JOIN wtab w ON p.i = w.i"""))

  // ---- eval_mcnemar: paired-snapshot significance ----
  // The question every eval report has to answer before a leaderboard
  // delta means anything: did model B actually improve on model A, or
  // is the delta coin-flip noise? McNemar's test is THE test for
  // paired binary outcomes on a shared task set — only the DISCORDANT
  // pairs carry signal (a task both pass or both fail says nothing
  // about the difference). χ² with continuity correction:
  //   χ² = (|b01 − b10| − 1)² / (b01 + b10)
  // — exact in truncated ppm (the numerator is a perfect BIGINT
  // square), with the b01 == b10 and zero-discordant cases pinned to
  // 0 (greatest(|d|−1, 0) makes the correction never overshoot).
  // Pairing contract: A = each task's lowest-id rollout, B = its
  // highest (two snapshots answering the same tasks — swap in two
  // real run ids); correctness = the eval_passk containment verdict,
  // so both ops read ONE verdict derivation. Significance at the
  // fixed 95% χ²₁ literal 3.841459 (ppm) — a literal, not a float.
  // One bounded-group fold into ONE 1-row output.
  val McnemarChi2CritPpm = 3841459L

  /** McNemar over a (task_id, doc_id, correct) verdict frame —
    * factored for fixture specs; the Op wires the passk verdicts.
    */
  def evalMcnemar(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("task_id"))
      .agg(
        count(lit(1)).as("n"),
        min_by(col("correct"), col("doc_id")).as("a_correct"),
        max_by(col("correct"), col("doc_id")).as("b_correct"))
      .where(col("n") >= 2) // a pair needs two distinct rollouts
      .agg(
        count(lit(1)).as("n_tasks"),
        sum(when(col("a_correct") === 1L && col("b_correct") === 1L, 1L)
          .otherwise(0L)).as("n_both_correct"),
        sum(when(col("a_correct") === 0L && col("b_correct") === 0L, 1L)
          .otherwise(0L)).as("n_both_wrong"),
        sum(when(col("a_correct") === 1L && col("b_correct") === 0L, 1L)
          .otherwise(0L)).as("n_a_only"),
        sum(when(col("a_correct") === 0L && col("b_correct") === 1L, 1L)
          .otherwise(0L)).as("n_b_only"))
      .select(col("n_tasks"), col("n_both_correct"), col("n_both_wrong"),
        col("n_a_only"), col("n_b_only"),
        expr("""CASE WHEN n_a_only + n_b_only = 0 THEN 0 ELSE
          (GREATEST(ABS(n_a_only - n_b_only) - 1, 0) *
           GREATEST(ABS(n_a_only - n_b_only) - 1, 0) * 1000000)
          DIV (n_a_only + n_b_only) END""").as("chi2_ppm"))
      .withColumn("significant_95",
        when(col("chi2_ppm") > McnemarChi2CritPpm, 1L).otherwise(0L))

  private val opEvalMcnemar = Op(
    "eval_mcnemar",
    (s, dir) => evalMcnemar(passkVerdicts(
      rollouts(s, dir).withColumnRenamed("prompt_id", "task_id"))),
    Some(rolloutsCte + s""",
      v AS (
        SELECT prompt_id AS task_id, doc_id, text,
          FIRST_VALUE(string_split(text, ' ')[1]) OVER (
            PARTITION BY prompt_id ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS answer
        FROM rollouts),
      c AS (
        SELECT task_id, doc_id,
          CASE WHEN strpos(text, answer) > 0 THEN 1 ELSE 0 END AS correct
        FROM v),
      pairs AS (
        SELECT task_id, COUNT(*) AS n,
          MIN_BY(correct, doc_id) AS a_correct,
          MAX_BY(correct, doc_id) AS b_correct
        FROM c GROUP BY task_id),
      agg AS (
        SELECT COUNT(*) AS n_tasks,
          SUM(CASE WHEN a_correct = 1 AND b_correct = 1 THEN 1 ELSE 0 END)
            AS n_both_correct,
          SUM(CASE WHEN a_correct = 0 AND b_correct = 0 THEN 1 ELSE 0 END)
            AS n_both_wrong,
          SUM(CASE WHEN a_correct = 1 AND b_correct = 0 THEN 1 ELSE 0 END)
            AS n_a_only,
          SUM(CASE WHEN a_correct = 0 AND b_correct = 1 THEN 1 ELSE 0 END)
            AS n_b_only
        FROM pairs WHERE n >= 2)
      SELECT CAST(n_tasks AS BIGINT) AS n_tasks,
        CAST(n_both_correct AS BIGINT) AS n_both_correct,
        CAST(n_both_wrong AS BIGINT) AS n_both_wrong,
        CAST(n_a_only AS BIGINT) AS n_a_only,
        CAST(n_b_only AS BIGINT) AS n_b_only,
        CAST(CASE WHEN n_a_only + n_b_only = 0 THEN 0 ELSE
          (GREATEST(ABS(n_a_only - n_b_only) - 1, 0) *
           GREATEST(ABS(n_a_only - n_b_only) - 1, 0) * 1000000) //
          (n_a_only + n_b_only) END AS BIGINT) AS chi2_ppm,
        CAST(CASE WHEN (CASE WHEN n_a_only + n_b_only = 0 THEN 0 ELSE
          (GREATEST(ABS(n_a_only - n_b_only) - 1, 0) *
           GREATEST(ABS(n_a_only - n_b_only) - 1, 0) * 1000000) //
          (n_a_only + n_b_only) END) > $McnemarChi2CritPpm
          THEN 1 ELSE 0 END AS BIGINT) AS significant_95
      FROM agg"""))

  // ---- eval_bootstrap: deterministic bootstrap CI over tasks ----
  // The error bar every eval report needs: a point accuracy over N
  // tasks means nothing without its resampling uncertainty, and the
  // standard instrument is the bootstrap percentile CI over TASKS
  // (tasks are the exchangeable unit; resampling samples within a
  // task would understate correlation). Determinism discipline: the
  // classic n-draws-with-replacement bootstrap needs a shared random
  // stream, but the POISSON bootstrap (Chamandy et al. 2012, "the
  // map-reduce bootstrap") replaces it with an independent
  // Poisson(1) weight per (task, resample) — exactly the shape a
  // distributed engine wants (per-row weights, no coordination), and
  // here the weight comes from the Lehmer hash's inverse-CDF
  // (permille thresholds 368/736/920/981 = the Poisson(1) CDF), so
  // both engines replay the identical integer draw.
  //
  // Scale shape: the bootstrap explodes the PER-TASK frame (already
  // aggregated — tasks ≪ samples) by B, map-side combines to B
  // partial-sum rows, and the CI is a rank selection over the B-row
  // frame. One skinny shuffle of B rows; nothing is O(corpus · B).
  val BootB = 200L

  /** Per-resample bootstrap accuracies + the percentile-CI rank
    * selection over a (task_id, acc_ppm) frame. Output: one row per
    * resample with its effective task mass, accuracy, rank, the
    * shared point estimate, and the CI-bound flags (rank
    * ceil(0.025·B) and ceil(0.975·B) — exact integer selection, no
    * float percentile).
    */
  def evalBootstrap(perTask: DataFrame): DataFrame = {
    val rankLo = (BootB * 25 + 999) / 1000
    val rankHi = (BootB * 975 + 999) / 1000
    val point = perTask.agg(
      expr("sum(acc_ppm) div count(1)").as("point_ppm"))
    val boots = perTask
      .select(col("task_id"), col("acc_ppm"),
        explode(expr(s"sequence(0L, ${BootB - 1}L)")).as("b"))
      .withColumn("p", expr(
        s"(((task_id * $BootB + b + 1) * ${Sampling.MixMul})" +
          s" % ${Sampling.MixMod}) * 1000 div ${Sampling.MixMod}"))
      .withColumn("w", expr(
        "CASE WHEN p < 368 THEN 0 WHEN p < 736 THEN 1" +
          " WHEN p < 920 THEN 2 WHEN p < 981 THEN 3 ELSE 4 END"))
      .groupBy(col("b"))
      .agg(sum(col("w")).cast("long").as("n_eff"),
        expr("sum(w * acc_ppm)").as("mass"))
      .select(col("b"), col("n_eff"),
        expr("mass div greatest(n_eff, 1)").as("boot_ppm"))
    boots
      .withColumn("rk", row_number().over(
        Window.orderBy(col("boot_ppm"), col("b"))).cast("long"))
      .crossJoin(broadcast(point))
      .select(col("b"), col("n_eff"), col("boot_ppm"), col("rk"),
        col("point_ppm"),
        when(col("rk") === rankLo, 1L).otherwise(0L).as("is_ci_lo"),
        when(col("rk") === rankHi, 1L).otherwise(0L).as("is_ci_hi"))
  }

  private val opEvalBootstrap = Op(
    "eval_bootstrap",
    (s, dir) => evalBootstrap(
      passkVerdicts(rollouts(s, dir).withColumnRenamed("prompt_id",
          "task_id"))
        .groupBy(col("task_id"))
        .agg(expr("(sum(correct) * 1000000) div count(1)").as("acc_ppm"))),
    Some(rolloutsCte + s""",
      v AS (
        SELECT prompt_id AS task_id, doc_id, text,
          FIRST_VALUE(string_split(text, ' ')[1]) OVER (
            PARTITION BY prompt_id ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS answer
        FROM rollouts),
      pt AS (
        SELECT task_id,
          (SUM(CASE WHEN strpos(text, answer) > 0 THEN 1 ELSE 0 END)
            * 1000000) // COUNT(*) AS acc_ppm
        FROM v GROUP BY task_id),
      point AS (
        SELECT CAST(SUM(acc_ppm) // COUNT(*) AS BIGINT) AS point_ppm
        FROM pt),
      draws AS (
        SELECT b, task_id, acc_ppm,
          (((task_id * $BootB + b + 1) * ${Sampling.MixMul})
            % ${Sampling.MixMod}) * 1000 // ${Sampling.MixMod} AS p
        FROM pt, UNNEST(generate_series(0, ${BootB - 1})) AS u(b)),
      wts AS (
        SELECT b, acc_ppm,
          CASE WHEN p < 368 THEN 0 WHEN p < 736 THEN 1
               WHEN p < 920 THEN 2 WHEN p < 981 THEN 3 ELSE 4 END AS w
        FROM draws),
      boots AS (
        SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
          CAST(SUM(w * acc_ppm) // GREATEST(SUM(w), 1) AS BIGINT)
            AS boot_ppm
        FROM wts GROUP BY b),
      ranked AS (
        SELECT b, n_eff, boot_ppm,
          CAST(ROW_NUMBER() OVER (ORDER BY boot_ppm, b) AS BIGINT) AS rk
        FROM boots)
      SELECT r.b, r.n_eff, r.boot_ppm, r.rk, point.point_ppm,
        CAST(CASE WHEN r.rk = ${(BootB * 25 + 999) / 1000} THEN 1
          ELSE 0 END AS BIGINT) AS is_ci_lo,
        CAST(CASE WHEN r.rk = ${(BootB * 975 + 999) / 1000} THEN 1
          ELSE 0 END AS BIGINT) AS is_ci_hi
      FROM ranked r, point"""))

  // ---- eval_wilson: per-model accuracy with Wilson bounds ----
  // The leaderboard row done right: a per-model accuracy over n
  // verdicts is published WITH its Wilson score interval (the
  // interval of choice for binomial proportions — unlike the normal
  // approximation it never leaves [0,1] and stays honest at x=0/x=n,
  // exactly the regimes eval slices hit). z is the 2σ convention
  // (z=2, 95.4% — the eval-report shorthand; z=1.96 would force
  // irrational literals through both engines for a 0.04σ nicety).
  // With z=2 the bounds are (x+2 ± 2√(x(n−x)/n + 1))/(n+4) — the
  // integer recipe runs v = x(n−x) DIV n (exact to <1), then
  // half_ppm = 2000·⌊√((v+1)·10⁶)⌋: BIGINT→double is IEEE-exact
  // rounding and sqrt is IEEE correctly-rounded in BOTH engines, so
  // the floor replays identically (the epochPlan isqrt argument);
  // resolution ±2000 ppm on the half-width, headroom to n ≈ 6·10⁹
  // verdicts per model. Bounds clamp to [0, 10⁶].
  // Scale shape: rides the passk verdict scan; one groupBy folding
  // to BtModels rows. Nothing after the fold touches the corpus.

  /** Wilson rows over a (model_id, correct) frame — factored for
    * fixture specs; the Op wires the rollout verdicts.
    */
  def evalWilson(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("model_id"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("correct")).as("n_correct"))
      .withColumn("v", expr("(n_correct * (n_samples - n_correct))" +
        " DIV n_samples"))
      .withColumn("half_ppm",
        expr("2000 * CAST(FLOOR(SQRT((v + 1) * 1000000)) AS BIGINT)"))
      .select(col("model_id"), col("n_samples"), col("n_correct"),
        expr("(n_correct * 1000000) DIV n_samples").as("acc_ppm"),
        expr("GREATEST(((n_correct + 2) * 1000000 - half_ppm)" +
          " DIV (n_samples + 4), 0)").as("lo_ppm"),
        expr("LEAST(((n_correct + 2) * 1000000 + half_ppm)" +
          " DIV (n_samples + 4), 1000000)").as("hi_ppm"))

  private val opEvalWilson = Op(
    "eval_wilson",
    (s, dir) => evalWilson(
      passkVerdicts(rollouts(s, dir)
          .withColumnRenamed("prompt_id", "task_id"))
        .withColumn("model_id", expr(s"doc_id % $BtModels"))),
    Some(rolloutsCte + s""",
      v AS (
        SELECT prompt_id AS task_id, doc_id, text,
          FIRST_VALUE(string_split(text, ' ')[1]) OVER (
            PARTITION BY prompt_id ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS answer
        FROM rollouts),
      c AS (
        SELECT doc_id % $BtModels AS model_id,
          CASE WHEN strpos(text, answer) > 0 THEN 1 ELSE 0 END AS correct
        FROM v),
      m AS (
        SELECT model_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
          CAST(SUM(correct) AS BIGINT) AS n_correct
        FROM c GROUP BY model_id),
      w AS (
        SELECT *,
          2000 * CAST(FLOOR(SQRT((
            (n_correct * (n_samples - n_correct)) // n_samples + 1)
            * 1000000)) AS BIGINT) AS half_ppm
        FROM m)
      SELECT model_id, n_samples, n_correct,
        CAST((n_correct * 1000000) // n_samples AS BIGINT) AS acc_ppm,
        CAST(GREATEST(((n_correct + 2) * 1000000 - half_ppm)
          // (n_samples + 4), 0) AS BIGINT) AS lo_ppm,
        CAST(LEAST(((n_correct + 2) * 1000000 + half_ppm)
          // (n_samples + 4), 1000000) AS BIGINT) AS hi_ppm
      FROM w"""))

  val ops: Seq[Op] = Seq(opGrpoAdv, opKtoLabels, opEvalPassk,
    opPrefAgree, opBtRating, opEvalMcnemar, opEvalBootstrap, opEvalWilson)
}
