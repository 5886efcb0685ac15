package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Post-training data preparation — the SFT / preference-tuning side
  * of the pipeline (the reference's map-reduce scoring family feeds
  * eval; these ops feed the fine-tuning stage itself). Three surfaces
  * every post-training stack needs:
  *
  *   - sft_render: multi-turn conversation assembly into a chat-template
  *     string with per-turn LOSS-MASK character spans ("train on
  *     assistant tokens only" — the standard SFT masking rule).
  *   - dpo_pairs: preference-pair construction (chosen, rejected) from
  *     scored candidates per prompt — the DPO/RLHF data shape.
  *   - conv_paths: message-TREE flattening into root→leaf linear
  *     conversations (the OpenAssistant release shape: a prompt tree
  *     where every root-to-leaf path is one training conversation).
  *
  * Scale shape, per op: sft_render's only wide operations are a window
  * and a groupBy both keyed on conv_id — partitions are single
  * conversations (bounded by turn count, never by corpus size); the
  * digest concat folds ≤ TurnsPerConv pieces per group. dpo_pairs is
  * one window over ≤ CandidatesPerPrompt rows per prompt. conv_paths
  * is a recursive-CTE BFS planned as one equality join per tree LEVEL
  * (depth = log₃ n — ~30 levels at 10¹⁴ rows), each level shuffling
  * only (id, depth, path, chars) rows; every node appears in exactly
  * one path prefix per level, so per-level volume is ≤ |nodes| — no
  * fan-out. Nothing here buffers a corpus-sized partition.
  */
object PostTrain {

  /** Turns per synthetic conversation (doc_id DIV 4 groups). */
  val TurnsPerConv = 4

  // Conversations are derived from `documents` by fixed arithmetic:
  // conv_id = doc_id DIV 4, turn_idx = doc_id % 4, roles alternate
  // user/assistant from turn 0 — the same synthetic-pairing convention
  // as MapReduceDocs.pairs (prediction = doc, reference = next doc).
  private def turns(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      expr(s"doc_id DIV $TurnsPerConv").as("conv_id"),
      expr(s"doc_id % $TurnsPerConv").as("turn_idx"),
      when(expr(s"(doc_id % $TurnsPerConv) % 2 = 0"), lit("user"))
        .otherwise(lit("assistant")).as("role"),
      col("text"),
      col("n_chars"))

  private val turnsCte = s"""
    WITH turns AS (
      SELECT doc_id // $TurnsPerConv AS conv_id,
        doc_id % $TurnsPerConv AS turn_idx,
        CASE WHEN (doc_id % $TurnsPerConv) % 2 = 0
             THEN 'user' ELSE 'assistant' END AS role,
        text, n_chars
      FROM documents)"""

  // ---- sft_render: chat-template rendering + loss-mask spans ----
  // Each turn renders as '<|ROLE|>' || text || '<|end|>'; the rendered
  // conversation is the turn pieces concatenated in turn order.
  // start_char/end_char are the 0-based [start, end) character span of
  // the turn's CONTENT inside the rendered conversation (header and
  // end tag excluded — exactly the span a loss mask keeps), in_loss=1
  // on assistant turns. conv_digest = md5 of the full rendered string
  // proves the assembly end-to-end; conv_len is its length. The
  // running offset is a window cumsum over the conversation (≤ 4-row
  // partitions); the digest is one groupBy(conv_id) concat of the
  // turn-sorted pieces — both keyed on conv_id, nothing corpus-wide.
  /** Core rendering over a (conv_id, turn_idx, role, text) frame —
    * factored for fixture specs; the Op wires the documents derivation.
    */
  def sftRender(turnRows: DataFrame): DataFrame = {
      val t = turnRows
        .withColumn("piece",
          concat(lit("<|"), col("role"), lit("|>"), col("text"),
            lit("<|end|>")))
        .withColumn("piece_len", length(col("piece")).cast("long"))
        .withColumn("header_len", (length(col("role")) + 4).cast("long"))
      // all three window frames share ONE partitioning+ordering
      // (conv_id, turn_idx), so the plan pays a single exchange + sort
      // and scans the corpus once — no conv-level self-join (census:
      // 2 shuffles / 2 scans → 1 / 1). Full frames buffer one
      // conversation (≤ TurnsPerConv rows), never the corpus.
      val byConv = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      val fullConv =
        byConv.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
      t.withColumn("piece_start",
          coalesce(sum(col("piece_len")).over(
            byConv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("start_char", col("piece_start") + col("header_len"))
        .withColumn("end_char",
          col("start_char") + length(col("text")).cast("long"))
        .withColumn("in_loss",
          when(col("role") === "assistant", 1L).otherwise(0L))
        .withColumn("conv_digest",
          md5(array_join(transform(
            array_sort(collect_list(struct(col("turn_idx"), col("piece")))
              .over(fullConv)),
            x => x.getField("piece")), "")))
        .withColumn("conv_len", sum(col("piece_len")).over(fullConv))
        .select("conv_id", "turn_idx", "role", "start_char",
          "end_char", "in_loss", "conv_digest", "conv_len")
  }

  private val opSftRender = Op(
    "sft_render",
    (s, dir) => sftRender(turns(s, dir)),
    Some(turnsCte + """,
      pieces AS (
        SELECT conv_id, turn_idx, role,
          '<|' || role || '|>' || text || '<|end|>' AS piece,
          CAST(length('<|' || role || '|>' || text || '<|end|>') AS BIGINT)
            AS piece_len,
          CAST(length(role) + 4 AS BIGINT) AS header_len,
          CAST(length(text) AS BIGINT) AS text_len
        FROM turns),
      off AS (
        SELECT conv_id, turn_idx, role, header_len, text_len,
          COALESCE(SUM(piece_len) OVER (PARTITION BY conv_id
            ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS piece_start
        FROM pieces),
      conv AS (
        SELECT conv_id,
          md5(string_agg(piece, '' ORDER BY turn_idx)) AS conv_digest,
          CAST(SUM(piece_len) AS BIGINT) AS conv_len
        FROM pieces GROUP BY conv_id)
      SELECT o.conv_id, o.turn_idx, o.role,
        CAST(o.piece_start + o.header_len AS BIGINT) AS start_char,
        CAST(o.piece_start + o.header_len + o.text_len AS BIGINT)
          AS end_char,
        CAST(CASE WHEN o.role = 'assistant' THEN 1 ELSE 0 END AS BIGINT)
          AS in_loss,
        c.conv_digest, c.conv_len
      FROM off o JOIN conv c USING (conv_id)"""))

  // ---- dpo_pairs: preference-pair construction ----
  // The DPO/RLHF data shape: CandidatesPerPrompt generations per
  // prompt (prompt_id = doc_id DIV 4), a deterministic integer quality
  // score (distinct-token count dominant, stored n_chars as the
  // tiebreak signal — the score is the ranking CONTRACT, swap in any
  // trained scorer), chosen = top-ranked, rejected = bottom-ranked,
  // ties broken by doc_id in OPPOSITE directions so chosen ≠ rejected
  // whenever the group has ≥ 2 rows; degenerate all-tied groups
  // (margin 0) are dropped — a zero-margin pair teaches nothing.
  // One window over ≤ 4-row prompt partitions; skinny output.
  /** Pair construction over a (prompt_id, doc_id, score) frame —
    * factored for fixture specs; the Op wires the documents scoring.
    */
  def dpoPairs(scored: DataFrame): DataFrame = {
      val best = Window.partitionBy(col("prompt_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
      val worst = Window.partitionBy(col("prompt_id"))
        .orderBy(col("score").asc, col("doc_id").desc)
      scored
        .withColumn("rb", row_number().over(best))
        .withColumn("rw", row_number().over(worst))
        .groupBy(col("prompt_id"))
        .agg(
          max(when(col("rb") === 1, col("doc_id"))).as("chosen_doc"),
          max(when(col("rb") === 1, col("score"))).as("chosen_score"),
          max(when(col("rw") === 1, col("doc_id"))).as("rejected_doc"),
          max(when(col("rw") === 1, col("score"))).as("rejected_score"))
        .where(col("chosen_score") > col("rejected_score"))
        .select(col("prompt_id"), col("chosen_doc"), col("rejected_doc"),
          col("chosen_score"), col("rejected_score"),
          (col("chosen_score") - col("rejected_score")).as("margin"))
  }

  private val opDpoPairs = Op(
    "dpo_pairs",
    (s, dir) => dpoPairs(Tables(s, dir, "documents").select(
      expr(s"doc_id DIV $TurnsPerConv").as("prompt_id"),
      col("doc_id"),
      (size(array_distinct(split(col("text"), " "))).cast("long") *
        100000L + col("n_chars")).as("score"))),
    Some(s"""
      WITH scored AS (
        SELECT doc_id // $TurnsPerConv AS prompt_id, doc_id,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            * 100000 + n_chars AS score
        FROM documents),
      ranked AS (
        SELECT prompt_id, doc_id, score,
          ROW_NUMBER() OVER (PARTITION BY prompt_id
            ORDER BY score DESC, doc_id ASC) AS rb,
          ROW_NUMBER() OVER (PARTITION BY prompt_id
            ORDER BY score ASC, doc_id DESC) AS rw
        FROM scored),
      agg AS (
        SELECT prompt_id,
          MAX(CASE WHEN rb = 1 THEN doc_id END) AS chosen_doc,
          MAX(CASE WHEN rb = 1 THEN score END) AS chosen_score,
          MAX(CASE WHEN rw = 1 THEN doc_id END) AS rejected_doc,
          MAX(CASE WHEN rw = 1 THEN score END) AS rejected_score
        FROM ranked GROUP BY prompt_id)
      SELECT prompt_id, chosen_doc, rejected_doc, chosen_score,
        rejected_score, chosen_score - rejected_score AS margin
      FROM agg WHERE chosen_score > rejected_score"""))

  // ---- conv_paths: message-tree flattening (root→leaf linearization) --
  // The OpenAssistant release shape: replies form a TREE; each
  // root-to-leaf path is one linear training conversation. The tree is
  // fixed arithmetic over doc_id (parent(d) = (d−1) DIV 3, root 0 — a
  // complete ternary tree over whatever ids exist), so the op is the
  // pure flattening semantics: a recursive-CTE BFS from the root where
  // each level joins children to the frontier by the EQUALITY key
  // (child−1) DIV 3 = parent — one ordinary hash join per level, depth
  // log₃ n, per-level row volume ≤ |nodes| (each node extends exactly
  // one path). Spark 4's WITH RECURSIVE plans it declaratively, same
  // surface as q32_khop. Leaves are nodes with no surviving children
  // (3·id+1 > max id); output is the leaf path id-string, its depth,
  // and the summed n_chars along the path (the packed-length signal a
  // sampler reads before cutting long conversations).
  /** Flattening over an (id, n_chars) node frame — factored for
    * fixture specs; the Op wires the documents derivation.
    */
  def convPaths(nodes: DataFrame): DataFrame = {
      val s = nodes.sparkSession
      nodes
        .localCheckpoint() // referenced once per recursion level
        .createOrReplaceTempView("graft_conv_nodes")
      s.sql(s"""
        WITH RECURSIVE walk(id, depth, path, path_chars) AS (
          SELECT id, 0, CAST(id AS STRING), n_chars
          FROM graft_conv_nodes WHERE id = 0
          UNION ALL
          SELECT n.id, w.depth + 1,
            w.path || '/' || CAST(n.id AS STRING),
            w.path_chars + n.n_chars
          FROM walk w JOIN graft_conv_nodes n
            ON (n.id - 1) DIV 3 = w.id AND n.id >= 1)
        SELECT w.id AS leaf_id, CAST(w.depth AS BIGINT) AS depth,
          w.path, w.path_chars
        FROM walk w,
          (SELECT MAX(id) AS m FROM graft_conv_nodes) mx
        WHERE w.id * 3 + 1 > mx.m""")
  }

  private val opConvPaths = Op(
    "conv_paths",
    (s, dir) => convPaths(Tables(s, dir, "documents")
      .select(col("doc_id").as("id"), col("n_chars"))),
    Some("""
      WITH RECURSIVE nodes AS (
        SELECT doc_id AS id, n_chars FROM documents),
      walk(id, depth, path, path_chars) AS (
        SELECT id, 0, CAST(id AS VARCHAR), n_chars FROM nodes WHERE id = 0
        UNION ALL
        SELECT n.id, w.depth + 1,
          w.path || '/' || CAST(n.id AS VARCHAR),
          w.path_chars + n.n_chars
        FROM walk w JOIN nodes n ON (n.id - 1) // 3 = w.id AND n.id >= 1)
      SELECT w.id AS leaf_id, CAST(w.depth AS BIGINT) AS depth,
        w.path, w.path_chars
      FROM walk w, (SELECT MAX(id) AS m FROM nodes) mx
      WHERE w.id * 3 + 1 > mx.m"""))

  // ---- sft_pack: whole-conversation packing with remapped masks ----
  // The step between sft_render and the trainer: conversations are
  // laid out in conv_id order, the stream cut into PackLen-char packs
  // — but UNLIKE seq_pack's concat-and-chunk, a conversation is an
  // ATOM here (a loss span must never straddle a sequence boundary, so
  // SFT packers place examples whole): each conversation lands in the
  // pack its start position falls in, packs absorb the overflow (fill
  // < PackLen + the longest conversation; an over-long conversation
  // owns its pack and the skipped pack ids after it stay empty —
  // documented, deterministic). Loss-mask spans come out REMAPPED to
  // pack coordinates: span = pack_off + the turn's render offset — the
  // exact (start, end) a loader masks inside the packed sequence.
  //
  // Scale: the running start is PrefixSum.exclusive over the skinny
  // (conv_id, conv_len) frame (the seq_pack machinery — every window
  // frame O(target) or O(√B)); pack_off needs min(start) per pack,
  // a window over ≤ PackLen-member partitions (every conversation is
  // ≥ 1 char); the span join is keyed on conv_id. Text never moves.
  val PackLen = 2048L
  val PackTargetBucket = 1000L

  /** Conv-level placement (conv_id, conv_len, pack_id, pack_off) —
    * the packing decision, factored so sftPack and packStats share one
    * derivation (same PrefixSum machinery, same bucket sizing).
    */
  def sftPlace(rendered: DataFrame): DataFrame = {
    // ONE job materializes the lazy checkpoint AND measures (n, maxId)
    // — the old shape paid an eager-checkpoint job plus two separate
    // sizing actions (r18 optimization round)
    val conv = rendered.select(col("conv_id"), col("conv_len"))
      .dropDuplicates("conv_id")
      .localCheckpoint(eager = false) // sizes the prefix-sum buckets
    val sizedRow = conv
      .agg(count(lit(1)), coalesce(max(col("conv_id")), lit(0L))).head()
    val n = math.max(sizedRow.getLong(0), 1L)
    val maxId = sizedRow.getLong(1)
    val width = math.max((maxId + 1) / math.max(n / PackTargetBucket, 1L),
      1L)
    val cum = graft.functions.PrefixSum.exclusive(
      conv.withColumn("bkt", expr(s"CAST(conv_id DIV $width AS BIGINT)")),
      "conv_len", Seq(col("conv_id")),
      numBuckets = (maxId + 1) / width + 1, out = "cum_before")
      .withColumn("pack_id", expr(s"cum_before DIV $PackLen"))
    val byPack = Window.partitionBy(col("pack_id"))
    cum
      .withColumn("pack_off",
        col("cum_before") - min(col("cum_before")).over(byPack))
      .select(col("conv_id"), col("conv_len"), col("pack_id"),
        col("pack_off"))
  }

  /** Packing over sftRender's output — factored for fixture specs. */
  def sftPack(rendered: DataFrame): DataFrame = {
    val placed = sftPlace(rendered)
      .select(col("conv_id"), col("pack_id"), col("pack_off"))
    rendered.join(placed, "conv_id")
      .select(col("conv_id"), col("turn_idx"), col("pack_id"),
        col("pack_off"),
        (col("pack_off") + col("start_char")).as("span_start"),
        (col("pack_off") + col("end_char")).as("span_end"),
        col("in_loss"))
  }

  private val opSftPack = Op(
    "sft_pack",
    (s, dir) => sftPack(sftRender(turns(s, dir))),
    Some(turnsCte + s""",
      pieces AS (
        SELECT conv_id, turn_idx, role,
          CAST(length('<|' || role || '|>' || text || '<|end|>') AS BIGINT)
            AS piece_len,
          CAST(length(role) + 4 AS BIGINT) AS header_len,
          CAST(length(text) AS BIGINT) AS text_len
        FROM turns),
      off AS (
        SELECT conv_id, turn_idx, role, header_len, text_len,
          COALESCE(SUM(piece_len) OVER (PARTITION BY conv_id
            ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS piece_start
        FROM pieces),
      conv AS (
        SELECT conv_id, CAST(SUM(piece_len) AS BIGINT) AS conv_len
        FROM pieces GROUP BY conv_id),
      cum AS (
        SELECT conv_id,
          CAST(COALESCE(SUM(conv_len) OVER (ORDER BY conv_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cum_before
        FROM conv),
      packs AS (
        SELECT conv_id, cum_before, cum_before // $PackLen AS pack_id
        FROM cum),
      placed AS (
        SELECT conv_id, pack_id,
          cum_before - MIN(cum_before) OVER (PARTITION BY pack_id)
            AS pack_off
        FROM packs)
      SELECT o.conv_id, o.turn_idx, p.pack_id, p.pack_off,
        CAST(p.pack_off + o.piece_start + o.header_len AS BIGINT)
          AS span_start,
        CAST(p.pack_off + o.piece_start + o.header_len + o.text_len
          AS BIGINT) AS span_end,
        CAST(CASE WHEN o.role = 'assistant' THEN 1 ELSE 0 END AS BIGINT)
          AS in_loss
      FROM off o JOIN placed p USING (conv_id)"""))

  // ---- best_of_n: rejection-sampling selection (the RFT recipe) ----
  // The third preference-data shape after dpo_pairs' extremes: keep
  // the TOP BonKeep candidates per prompt that clear an ABSOLUTE
  // quality floor (rejection sampling / STaR-style fine-tuning keeps
  // every good-enough sample, not just the argmax — a prompt where
  // nothing clears the floor contributes nothing, a prompt where all
  // do contributes at most BonKeep). Rank = (score DESC, doc_id ASC),
  // the dpo_pairs chosen-side tie rule, so selection is deterministic
  // and arrival-order-free. The floor is relative to the corpus: the
  // global mean score (one 1-row aggregate, broadcast) — a fixed
  // constant would silently go stale as the scorer drifts. ONE window
  // over ≤ CandidatesPerPrompt-row partitions + one tiny broadcast;
  // integer scores → full oracle.
  val BonKeep = 2

  /** Selection over a (prompt_id, doc_id, score) frame — factored for
    * fixture specs; the Op wires the documents scoring.
    */
  def bestOfN(scored: DataFrame): DataFrame = {
    val floor = scored.agg(
      (sum(col("score")) / count(lit(1))).as("floor_score"))
    val ranked = scored
      .join(broadcast(floor))
      .where(col("score").cast("double") >= col("floor_score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("prompt_id"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .where(col("rank") <= BonKeep)
    ranked.select(col("prompt_id"), col("doc_id"),
      col("rank").cast("long").as("rank"), col("score"))
  }

  private val opBestOfN = Op(
    "best_of_n",
    (s, dir) => bestOfN(Tables(s, dir, "documents").select(
      expr(s"doc_id DIV $TurnsPerConv").as("prompt_id"),
      col("doc_id"),
      (size(array_distinct(split(col("text"), " "))).cast("long") *
        100000L + col("n_chars")).as("score"))),
    Some(s"""
      WITH scored AS (
        SELECT doc_id // $TurnsPerConv AS prompt_id, doc_id,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            * 100000 + n_chars AS score
        FROM documents),
      fl AS (SELECT SUM(score) / COUNT(*) AS floor_score FROM scored),
      ranked AS (
        SELECT prompt_id, doc_id, score,
          ROW_NUMBER() OVER (PARTITION BY prompt_id
            ORDER BY score DESC, doc_id ASC) AS rank
        FROM scored, fl
        WHERE CAST(score AS DOUBLE) >= floor_score)
      SELECT prompt_id, doc_id, CAST(rank AS BIGINT) AS rank, score
      FROM ranked WHERE rank <= $BonKeep"""))

  // ---- template_audit: reserved-marker collision scan ----
  // The safety gate BEFORE sft_render: a document whose text contains
  // the template's reserved sequences ('<|' / '|>') would render into
  // a string where marker-based reparsing (and any tokenizer with
  // special-token atoms) sees turn boundaries the loss mask never
  // intended — the classic special-token injection vector. sft_render
  // itself is immune (its spans are ARITHMETIC, never re-parsed), so
  // the audit's job is to FLAG the docs that make the rendered string
  // ambiguous for everything downstream that is not offset-based.
  // One narrow projection per doc: collision counts for both markers,
  // the first collision's 1-based position (0 = none), and the clean
  // bit — scan-speed at any corpus size, nothing wide anywhere.
  /** The audit projection over a (doc_id, text) frame — factored for
    * fixture specs; the Op wires the documents table.
    */
  def templateAudit(docs: DataFrame): DataFrame = docs.select(
      col("doc_id"),
      expr("(length(text) - length(replace(text, '<|', ''))) DIV 2")
        .as("n_open"),
      expr("(length(text) - length(replace(text, '|>', ''))) DIV 2")
        .as("n_close"),
      least(
        when(instr(col("text"), "<|") === 0, lit(Int.MaxValue))
          .otherwise(instr(col("text"), "<|")),
        when(instr(col("text"), "|>") === 0, lit(Int.MaxValue))
          .otherwise(instr(col("text"), "|>")))
        .cast("long").as("first_pos_raw"))
      .select(
        col("doc_id"), col("n_open"), col("n_close"),
        when(col("first_pos_raw") === Int.MaxValue.toLong, 0L)
          .otherwise(col("first_pos_raw")).as("first_collision"),
        when(col("n_open") + col("n_close") === 0, 1L).otherwise(0L)
          .as("is_clean"))

  private val opTemplateAudit = Op(
    "template_audit",
    (s, dir) => templateAudit(Tables(s, dir, "documents")),
    Some("""
      WITH a AS (
        SELECT doc_id,
          CAST((length(text) - length(replace(text, '<|', ''))) / 2
            AS BIGINT) AS n_open,
          CAST((length(text) - length(replace(text, '|>', ''))) / 2
            AS BIGINT) AS n_close,
          LEAST(
            CASE WHEN strpos(text, '<|') = 0 THEN 2147483647
                 ELSE strpos(text, '<|') END,
            CASE WHEN strpos(text, '|>') = 0 THEN 2147483647
                 ELSE strpos(text, '|>') END) AS fp
        FROM documents)
      SELECT doc_id, n_open, n_close,
        CAST(CASE WHEN fp = 2147483647 THEN 0 ELSE fp END AS BIGINT)
          AS first_collision,
        CAST(CASE WHEN n_open + n_close = 0 THEN 1 ELSE 0 END AS BIGINT)
          AS is_clean
      FROM a"""))

  // ---- prm_pairs: step-level preference pairs at tree branch points --
  // The process-reward-model data shape (Lightman et al. 2023 /
  // Math-Shepherd): where dpo_pairs compares COMPLETE responses per
  // prompt, PRM training compares SIBLING CONTINUATIONS at every
  // branch point of a rollout tree — each pair (shared prefix, better
  // child, worse child) supervises the step that diverged. The tree is
  // conv_paths' fixed contract (parent(d) = (d−1) DIV 3, root 0), the
  // score is dpo_pairs' deterministic contract, chosen/rejected take
  // the same opposite-direction tie-breaks, all-tied sibling groups are
  // dropped; n_candidates (surviving siblings) rides along — the
  // group-size signal a trainer weights pairs by. ONE window over
  // ≤ 3-row sibling partitions + one groupBy; skinny integer output →
  // full oracle. Nothing here walks the tree: the branch-point
  // comparison needs only the PARENT KEY, so cost is one hash
  // aggregation regardless of tree depth (conv_paths already owns the
  // prefix materialization when a trainer wants the text).
  /** Pair construction over an (id, score) node frame — factored for
    * fixture specs; the Op wires the documents scoring.
    */
  def prmPairs(nodes: DataFrame): DataFrame = {
    val kids = nodes.where(col("id") >= 1)
      .select(expr("(id - 1) DIV 3").as("parent_id"), col("id"),
        col("score"))
    val best = Window.partitionBy(col("parent_id"))
      .orderBy(col("score").desc, col("id").asc)
    val worst = Window.partitionBy(col("parent_id"))
      .orderBy(col("score").asc, col("id").desc)
    kids
      .withColumn("rb", row_number().over(best))
      .withColumn("rw", row_number().over(worst))
      .groupBy(col("parent_id"))
      .agg(
        count(lit(1)).as("n_candidates"),
        max(when(col("rb") === 1, col("id"))).as("chosen_child"),
        max(when(col("rb") === 1, col("score"))).as("chosen_score"),
        max(when(col("rw") === 1, col("id"))).as("rejected_child"),
        max(when(col("rw") === 1, col("score"))).as("rejected_score"))
      .where(col("chosen_score") > col("rejected_score"))
      .select(col("parent_id"), col("n_candidates"), col("chosen_child"),
        col("rejected_child"), col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }

  private val opPrmPairs = Op(
    "prm_pairs",
    (s, dir) => prmPairs(Tables(s, dir, "documents").select(
      col("doc_id").as("id"),
      (size(array_distinct(split(col("text"), " "))).cast("long") *
        100000L + col("n_chars")).as("score"))),
    Some("""
      WITH kids AS (
        SELECT (doc_id - 1) // 3 AS parent_id, doc_id AS id,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            * 100000 + n_chars AS score
        FROM documents WHERE doc_id >= 1),
      ranked AS (
        SELECT parent_id, id, score,
          ROW_NUMBER() OVER (PARTITION BY parent_id
            ORDER BY score DESC, id ASC) AS rb,
          ROW_NUMBER() OVER (PARTITION BY parent_id
            ORDER BY score ASC, id DESC) AS rw
        FROM kids),
      agg AS (
        SELECT parent_id, COUNT(*) AS n_candidates,
          MAX(CASE WHEN rb = 1 THEN id END) AS chosen_child,
          MAX(CASE WHEN rb = 1 THEN score END) AS chosen_score,
          MAX(CASE WHEN rw = 1 THEN id END) AS rejected_child,
          MAX(CASE WHEN rw = 1 THEN score END) AS rejected_score
        FROM ranked GROUP BY parent_id)
      SELECT parent_id, CAST(n_candidates AS BIGINT) AS n_candidates,
        chosen_child, rejected_child, chosen_score, rejected_score,
        chosen_score - rejected_score AS margin
      FROM agg WHERE chosen_score > rejected_score"""))

  // ---- conv_lint: chat-format structural lint ----
  // The SFT-data lint that runs BEFORE sft_render bothers assembling
  // anything: per conversation — turn count, role-ALTERNATION
  // violations (the same role speaking twice in a row: merged turns,
  // dropped turns, or a broken collector), the first-role and
  // last-role contract bits (a training conversation opens with the
  // user and closes with the assistant — a dangling user turn trains
  // nothing), empty-turn count, and the clean bit gating entry into
  // the SFT set. One lag window + one groupBy sharing the conv_id
  // partitioning (the sessionize class); the corpus is clean BY
  // CONSTRUCTION (roles alternate from user by the turns contract) —
  // violation paths are exercised by planted fixtures, the
  // data_contract convention. Full oracle.
  /** Lint over a (conv_id, turn_idx, role, text) frame — factored for
    * fixture specs; the Op wires the documents derivation.
    */
  def convLint(turnRows: DataFrame): DataFrame = {
    val byConv = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turnRows
      .withColumn("prev_role", lag(col("role"), 1).over(byConv))
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_alternation_viol"),
        min_by(col("role"), col("turn_idx")).as("first_role"),
        max_by(col("role"), col("turn_idx")).as("last_role"),
        sum(when(length(col("text")) === 0, 1L).otherwise(0L))
          .as("n_empty_turns"))
      .select(col("conv_id"), col("n_turns"), col("n_alternation_viol"),
        col("first_role"), col("last_role"), col("n_empty_turns"),
        when(col("n_alternation_viol") === 0L &&
          col("first_role") === "user" &&
          col("last_role") === "assistant" &&
          col("n_empty_turns") === 0L, 1L).otherwise(0L).as("is_clean"))
  }

  private val opConvLint = Op(
    "conv_lint",
    (s, dir) => convLint(turns(s, dir)),
    Some(turnsCte + """,
      lagged AS (
        SELECT conv_id, turn_idx, role, text,
          LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
            AS prev_role
        FROM turns),
      agg AS (
        SELECT conv_id, COUNT(*) AS n_turns,
          SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END)
            AS n_alternation_viol,
          MIN_BY(role, turn_idx) AS first_role,
          MAX_BY(role, turn_idx) AS last_role,
          SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END)
            AS n_empty_turns
        FROM lagged GROUP BY conv_id)
      SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns,
        CAST(n_alternation_viol AS BIGINT) AS n_alternation_viol,
        first_role, last_role,
        CAST(n_empty_turns AS BIGINT) AS n_empty_turns,
        CAST(CASE WHEN n_alternation_viol = 0 AND first_role = 'user'
          AND last_role = 'assistant' AND n_empty_turns = 0
          THEN 1 ELSE 0 END AS BIGINT) AS is_clean
      FROM agg"""))

  // ---- pack_stats: packing-efficiency audit ----
  // The report a packing run is judged by BEFORE a trainer burns
  // compute on it: per pack — member count, fill (summed member
  // lengths), overflow beyond the PackLen budget (the atom rule lets
  // a pack absorb its last conversation whole; overflow chars are
  // positions the loader truncates or spills), and utilization ppm
  // (capped at 1e6 — an overflowing pack is FULL, not >full). Mean
  // utilization across packs is the padding waste the whole exercise
  // exists to minimize; a fleet of low-util packs means the length
  // distribution fights the budget. Aggregates sftPlace's conv-level
  // placement — one groupBy over ≤ PackLen-member partitions; the
  // oracle replays the sft_pack placement CTEs into the same
  // aggregate. Full oracle.
  /** The audit over a (conv_id, conv_len, pack_id, pack_off) placement
    * frame — factored for fixture specs; the Op wires the pipeline.
    */
  def packStats(placed: DataFrame): DataFrame =
    placed.groupBy(col("pack_id"))
      .agg(
        count(lit(1)).as("n_convs"),
        sum(col("conv_len")).as("fill_chars"))
      .select(col("pack_id"), col("n_convs"), col("fill_chars"),
        greatest(col("fill_chars") - PackLen, lit(0L))
          .as("overflow_chars"),
        expr(s"(LEAST(fill_chars, $PackLen) * 1000000) DIV $PackLen")
          .as("util_ppm"))

  private val opPackStats = Op(
    "pack_stats",
    (s, dir) => packStats(sftPlace(sftRender(turns(s, dir)))),
    Some(turnsCte + s""",
      pieces AS (
        SELECT conv_id,
          CAST(length('<|' || role || '|>' || text || '<|end|>') AS BIGINT)
            AS piece_len
        FROM turns),
      conv AS (
        SELECT conv_id, CAST(SUM(piece_len) AS BIGINT) AS conv_len
        FROM pieces GROUP BY conv_id),
      cum AS (
        SELECT conv_id, conv_len,
          CAST(COALESCE(SUM(conv_len) OVER (ORDER BY conv_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cum_before
        FROM conv),
      placed AS (
        SELECT conv_id, conv_len, cum_before // $PackLen AS pack_id
        FROM cum)
      SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_convs,
        CAST(SUM(conv_len) AS BIGINT) AS fill_chars,
        CAST(GREATEST(SUM(conv_len) - $PackLen, 0) AS BIGINT)
          AS overflow_chars,
        CAST((LEAST(SUM(conv_len), $PackLen) * 1000000) // $PackLen
          AS BIGINT) AS util_ppm
      FROM placed GROUP BY pack_id"""))

  // ---- refusal_detect: distillation-hygiene boilerplate gate ----
  // The SFT-entry filter every distilled dataset needs (the published
  // practice behind "uncensored"/cleaned SFT sets and the
  // OpenHermes/Dolphin data cards: teacher responses carrying
  // boilerplate refusals or AI self-reference teach the student to
  // refuse and self-identify, so they are filtered BEFORE training):
  // assistant turns matching the refusal/self-reference pattern set
  // are counted per conversation, and a conversation enters SFT only
  // when clean. The pattern set is the deterministic contract (swap
  // in a trained refusal classifier the same way); apostrophes are
  // spelled \x27 so the regex survives SQL single-quote literals in
  // both engines (the code_detect precedent). Only ASSISTANT turns
  // gate — a USER saying "as an AI" is fine.
  // Scale shape: per-row regex probe + one groupBy folding ≤
  // TurnsPerConv rows per conversation (the convLint partition
  // class) — no corpus-sized state anywhere.
  val RefusalRe =
    "(?i)\\b(i cannot|i can\\x27t|i am unable|i\\x27m sorry|as an ai" +
      "|i apologize|i must decline)\\b"

  /** Refusal audit over a (conv_id, turn_idx, role, text) frame —
    * factored so the spec plants real refusal turns.
    */
  private[graft] def refusalDetect(t: DataFrame): DataFrame =
    t.withColumn("is_ref",
        when(col("role") === "assistant" &&
          regexp_count(col("text"), lit(RefusalRe)) > 0, 1L)
          .otherwise(0L))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L))
          .as("n_assistant"),
        sum(col("is_ref")).as("n_refusals"),
        coalesce(min(when(col("is_ref") === 1L, col("turn_idx"))),
          lit(-1L)).as("first_refusal_turn"))
      .select(col("conv_id"), col("n_turns"), col("n_assistant"),
        col("n_refusals"), col("first_refusal_turn"),
        when(col("n_refusals") === 0L, 1L).otherwise(0L).as("keep_sft"))

  private val opRefusalDetect = Op(
    "refusal_detect",
    (s, dir) => refusalDetect(turns(s, dir)),
    Some(turnsCte + s""",
      probed AS (
        SELECT conv_id, turn_idx, role,
          CASE WHEN role = 'assistant'
            AND len(regexp_extract_all(text, '$RefusalRe')) > 0
            THEN 1 ELSE 0 END AS is_ref
        FROM turns)
      SELECT conv_id,
        CAST(COUNT(*) AS BIGINT) AS n_turns,
        CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_assistant,
        CAST(SUM(is_ref) AS BIGINT) AS n_refusals,
        CAST(COALESCE(MIN(CASE WHEN is_ref = 1 THEN turn_idx END), -1)
          AS BIGINT) AS first_refusal_turn,
        CAST(CASE WHEN SUM(is_ref) = 0 THEN 1 ELSE 0 END AS BIGINT)
          AS keep_sft
      FROM probed GROUP BY conv_id"""))

  val ops: Seq[Op] = Seq(opSftRender, opDpoPairs, opConvPaths, opSftPack,
    opBestOfN, opTemplateAudit, opPrmPairs, opConvLint, opPackStats,
    opRefusalDetect)
}
