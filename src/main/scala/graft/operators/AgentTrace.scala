package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Agentic-trace data preparation — the QC an agent-training pipeline
  * runs over tool-use traces before they become training data (the
  * conversation side is PostTrain.scala; these ops grade the TOOL
  * protocol inside each trace):
  *
  *   - agent_trace: per-trace tool-call integrity — call/result
  *     pairing as parenthesis matching over the event stream (running
  *     balance; unmatched results = the prefix-minimum identity,
  *     dangling calls = the final-balance identity), max call depth,
  *     error count, and the well-formed bit a trace must carry to
  *     enter the training set.
  *   - trace_bigram: the corpus's trace GRAMMAR — action-transition
  *     counts with per-source-action ppm (a spike in user→result or
  *     result→result transitions is a protocol violation class you
  *     see in aggregate long before you can name the offending trace).
  *   - tool_latency: per tool call, the time to the NEXT result in
  *     its trace (the forward as-of match) — the latency distribution
  *     that decides timeout budgets and flags hung-tool traces.
  *
  * The trace derivation is the deterministic contract over `events`:
  * trace = user_id, order = (ts, event_id), action = the fixed
  * event_type mapping below (click→call, view→result, signup→user,
  * purchase→assistant, error→error — swap in real trace actions).
  *
  * Scale shape: every window here is keyed on the trace id — the
  * q14_sessionize partition class, where 10× data is 10× partitions
  * of constant size (measured sf1→sf10 in BENCH_sf10 tier4).
  * trace_bigram's output is bounded by the action alphabet squared
  * (+1 start marker row per source action); agent_trace and
  * tool_latency emit one skinny integer row per trace / per call.
  */
object AgentTrace {

  private val actionCaseSql = """CASE event_type
    WHEN 'click' THEN 'call' WHEN 'view' THEN 'result'
    WHEN 'signup' THEN 'user' WHEN 'purchase' THEN 'assistant'
    ELSE 'error' END"""

  /** Trace rows (trace_id, event_id, ts_us, action) from an
    * events-shaped frame — shared by all three ops and the streaming
    * twin so every consumer sees the same mapping by construction.
    */
  def traceRows(events: DataFrame): DataFrame =
    events.select(
      col("user_id").as("trace_id"),
      col("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"),
      expr(actionCaseSql).as("action"))

  private val traceCte = s"""
    WITH trace AS (
      SELECT user_id AS trace_id, event_id, epoch_us(ts) AS ts_us,
        $actionCaseSql AS action
      FROM events)"""

  // ---- agent_trace: call/result pairing integrity per trace ----
  // The protocol check is parenthesis matching: delta = +1 per call,
  // −1 per result; over the (ts_us, event_id) order, with running
  // balance b_k and m = min_k b_k,
  //   unmatched_results = max(0, −m)   (results arriving with no open
  //                                     call — each dip below zero)
  //   dangling_calls    = b_final + unmatched_results
  // — the standard identities (each is exact, not a heuristic). A
  // trace enters training only when both are zero AND it carries no
  // error events.
  /** Integrity over a (trace_id, event_id, ts_us, action) frame —
    * factored for fixture specs; the Op wires the events derivation.
    */
  def agentTrace(trace: DataFrame): DataFrame = {
    val byTrace = Window.partitionBy(col("trace_id"))
      .orderBy(col("ts_us"), col("event_id"))
    trace
      .withColumn("delta",
        when(col("action") === "call", 1L)
          .when(col("action") === "result", -1L).otherwise(0L))
      .withColumn("bal", sum(col("delta")).over(
        byTrace.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("trace_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("action") === "call", 1L).otherwise(0L))
          .as("n_calls"),
        sum(when(col("action") === "result", 1L).otherwise(0L))
          .as("n_results"),
        sum(when(col("action") === "error", 1L).otherwise(0L))
          .as("n_errors"),
        greatest(max(col("bal")), lit(0L)).as("max_depth"),
        min(col("bal")).as("min_bal"),
        sum(col("delta")).as("final_bal"))
      .select(col("trace_id"), col("n_events"), col("n_calls"),
        col("n_results"), col("n_errors"), col("max_depth"),
        expr("GREATEST(-min_bal, 0)").as("unmatched_results"),
        expr("final_bal + GREATEST(-min_bal, 0)").as("dangling_calls"),
        expr("""CAST(CASE WHEN GREATEST(-min_bal, 0) = 0
                AND final_bal + GREATEST(-min_bal, 0) = 0
                AND n_errors = 0 THEN 1 ELSE 0 END AS BIGINT)""")
          .as("is_wellformed"))
  }

  private val opAgentTrace = Op(
    "agent_trace",
    (s, dir) => agentTrace(traceRows(Tables.events(s, dir))),
    Some(traceCte + """,
      bal AS (
        SELECT trace_id,
          CASE action WHEN 'call' THEN 1 WHEN 'result' THEN -1
            ELSE 0 END AS delta,
          action,
          SUM(CASE action WHEN 'call' THEN 1 WHEN 'result' THEN -1
            ELSE 0 END) OVER (PARTITION BY trace_id
            ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS bal
        FROM trace),
      agg AS (
        SELECT trace_id, COUNT(*) AS n_events,
          SUM(CASE WHEN action = 'call' THEN 1 ELSE 0 END) AS n_calls,
          SUM(CASE WHEN action = 'result' THEN 1 ELSE 0 END) AS n_results,
          SUM(CASE WHEN action = 'error' THEN 1 ELSE 0 END) AS n_errors,
          GREATEST(MAX(bal), 0) AS max_depth,
          MIN(bal) AS min_bal,
          SUM(delta) AS final_bal
        FROM bal GROUP BY trace_id)
      SELECT trace_id,
        CAST(n_events AS BIGINT) AS n_events,
        CAST(n_calls AS BIGINT) AS n_calls,
        CAST(n_results AS BIGINT) AS n_results,
        CAST(n_errors AS BIGINT) AS n_errors,
        CAST(max_depth AS BIGINT) AS max_depth,
        CAST(GREATEST(-min_bal, 0) AS BIGINT) AS unmatched_results,
        CAST(final_bal + GREATEST(-min_bal, 0) AS BIGINT)
          AS dangling_calls,
        CAST(CASE WHEN GREATEST(-min_bal, 0) = 0
          AND final_bal + GREATEST(-min_bal, 0) = 0
          AND n_errors = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_wellformed
      FROM agg"""))

  // ---- trace_bigram: the corpus's action-transition grammar ----
  // prev = lag(action) within the trace order, '^' at trace start;
  // per (prev, action): transition count and the ppm share among all
  // transitions LEAVING prev (rows of a Markov transition matrix) —
  // the aggregate view where protocol violation classes show up.
  /** Transition counts over a (trace_id, event_id, ts_us, action)
    * frame — factored for fixture specs.
    */
  def traceBigram(trace: DataFrame): DataFrame = {
    val byTrace = Window.partitionBy(col("trace_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val fromTotal = Window.partitionBy(col("prev_action"))
    trace
      .withColumn("prev_action",
        coalesce(lag(col("action"), 1).over(byTrace), lit("^")))
      .groupBy(col("prev_action"), col("action"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("from_total",
        sum(col("n_transitions")).over(fromTotal))
      .select(col("prev_action"), col("action"), col("n_transitions"),
        col("from_total"),
        expr("(n_transitions * 1000000) DIV from_total").as("share_ppm"))
  }

  private val opTraceBigram = Op(
    "trace_bigram",
    (s, dir) => traceBigram(traceRows(Tables.events(s, dir))),
    Some(traceCte + """,
      lagged AS (
        SELECT COALESCE(LAG(action) OVER (PARTITION BY trace_id
          ORDER BY ts_us, event_id), '^') AS prev_action, action
        FROM trace),
      counted AS (
        SELECT prev_action, action, COUNT(*) AS n_transitions
        FROM lagged GROUP BY prev_action, action)
      SELECT prev_action, action,
        CAST(n_transitions AS BIGINT) AS n_transitions,
        CAST(SUM(n_transitions) OVER (PARTITION BY prev_action)
          AS BIGINT) AS from_total,
        CAST((n_transitions * 1000000) //
          SUM(n_transitions) OVER (PARTITION BY prev_action)
          AS BIGINT) AS share_ppm
      FROM counted"""))

  // ---- tool_latency: call → next-result latency per call ----
  // The forward as-of match inside one window pass: for each call,
  // the MIN result-ts over the strictly-following rows of its trace
  // (ts is monotone in the frame order, so that min IS the next
  // result's ts); −1 when the trace ends with the call still open.
  // A timeout budget is then one quantile over latency_us, and a
  // hung-tool trace is `matched = 0`.
  /** Latencies over a (trace_id, event_id, ts_us, action) frame —
    * factored for fixture specs.
    */
  def toolLatency(trace: DataFrame): DataFrame = {
    val following = Window.partitionBy(col("trace_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    trace
      .withColumn("next_result_ts",
        min(when(col("action") === "result", col("ts_us"))).over(following))
      .where(col("action") === "call")
      .select(col("trace_id"), col("event_id"), col("ts_us"),
        when(col("next_result_ts").isNotNull, 1L).otherwise(0L)
          .as("matched"),
        coalesce(col("next_result_ts") - col("ts_us"), lit(-1L))
          .as("latency_us"))
  }

  private val opToolLatency = Op(
    "tool_latency",
    (s, dir) => toolLatency(traceRows(Tables.events(s, dir))),
    Some(traceCte + """,
      nxt AS (
        SELECT trace_id, event_id, ts_us, action,
          MIN(CASE WHEN action = 'result' THEN ts_us END) OVER (
            PARTITION BY trace_id ORDER BY ts_us, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS next_result_ts
        FROM trace)
      SELECT trace_id, event_id, ts_us,
        CAST(CASE WHEN next_result_ts IS NOT NULL THEN 1 ELSE 0 END
          AS BIGINT) AS matched,
        CAST(COALESCE(next_result_ts - ts_us, -1) AS BIGINT)
          AS latency_us
      FROM nxt WHERE action = 'call'"""))

  // ---- trace_returns: discounted reward-to-go per trace step ----
  // Step-level credit assignment — the value-target table a PRM /
  // value-head trainer reads per trace step: reward is the fixed
  // contract over the action mapping (+1 per assistant event — task
  // progress; −1 per error; 0 otherwise — swap in a real reward
  // model's verdicts), and the return is the discounted sum over the
  // next Horizon events in trace order. The discount enters as a
  // LITERAL γ^k ppm weight table (γ = 0.9, H = 8) shared verbatim
  // with the DuckDB oracle — the eval_retrieval log2-table move — so
  // the op is exact BIGINT arithmetic and hash-provable despite the
  // "float" discount. H leads over ONE per-trace window (the
  // sessionize partition class); beyond-trace-end rewards are 0 (the
  // trace is over — nothing left to credit).
  val ReturnHorizon = 8
  /** floor(1e6 · 0.9^k) for k = 0..7 — the discount contract. */
  val GammaPpm: Seq[Long] = Seq(1000000L, 900000L, 810000L, 729000L,
    656100L, 590490L, 531441L, 478296L)

  /** Returns over a (trace_id, event_id, ts_us, action) frame —
    * factored for fixture specs and the streaming twin.
    */
  def traceReturns(trace: DataFrame): DataFrame = {
    val byTrace = Window.partitionBy(col("trace_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val withR = trace.withColumn("reward",
      when(col("action") === "assistant", 1L)
        .when(col("action") === "error", -1L).otherwise(0L))
    val ret = GammaPpm.zipWithIndex.map {
      case (w, 0) => lit(w) * col("reward")
      case (w, k) => lit(w) * lead(col("reward"), k, 0L).over(byTrace)
    }.reduce(_ + _)
    withR.select(col("trace_id"), col("event_id"), col("ts_us"),
      col("action"), col("reward"), ret.as("return_ppm"))
  }

  private val returnTermsSql = GammaPpm.zipWithIndex.map {
    case (w, 0) => s"$w * reward"
    case (w, k) => s"$w * LEAD(reward, $k, 0) OVER w"
  }.mkString(" + ")

  private val opTraceReturns = Op(
    "trace_returns",
    (s, dir) => traceReturns(traceRows(Tables.events(s, dir))),
    Some(traceCte + s""",
      rew AS (
        SELECT trace_id, event_id, ts_us, action,
          CASE action WHEN 'assistant' THEN 1 WHEN 'error' THEN -1
            ELSE 0 END AS reward
        FROM trace)
      SELECT trace_id, event_id, ts_us, action,
        CAST(reward AS BIGINT) AS reward,
        CAST($returnTermsSql AS BIGINT) AS return_ppm
      FROM rew
      WINDOW w AS (PARTITION BY trace_id ORDER BY ts_us, event_id)"""))

  // ---- trace_loop: stuck-loop detection per trace ----
  // The failure mode agent_trace's balance identities CANNOT see: a
  // trace can be perfectly call/result paired and error-free while
  // the agent is stuck repeating the same action (a retry storm of
  // calls, a result-polling loop) — exactly the traces an agent
  // trainer must quarantine because they teach the policy to loop.
  // Detection is the longest run of the SAME consecutive action, via
  // the gaps-and-islands identity: with rn = row_number over the
  // trace order and rn_a = row_number over the same order restricted
  // to one action, (rn − rn_a) is constant exactly on a maximal
  // consecutive run of that action — a grouping key, no self-join.
  // run_action ties break to the lexicographically smallest action so
  // the row is deterministic. is_looping fires at LoopRunMin (4+
  // consecutive identical actions — one retry is normal, three
  // retries of the same step is a loop by any agent-runtime policy).
  // Scale shape: two windows + one agg, ALL keyed on trace_id — the
  // q14_sessionize partition class (10× data = 10× constant-size
  // partitions, measured in BENCH_sf10 tier4); output is one skinny
  // integer row per trace.
  val LoopRunMin = 4L

  /** Loop audit over a (trace_id, event_id, ts_us, action) frame —
    * factored for fixture specs; the Op wires the events derivation.
    */
  def traceLoop(trace: DataFrame): DataFrame = {
    val byTrace = Window.partitionBy(col("trace_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val byTraceAction = Window.partitionBy(col("trace_id"), col("action"))
      .orderBy(col("ts_us"), col("event_id"))
    val runs = trace
      .withColumn("grp",
        row_number().over(byTrace) - row_number().over(byTraceAction))
      .groupBy(col("trace_id"), col("action"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
    val mx = Window.partitionBy(col("trace_id"))
    runs
      .withColumn("mxr", max(col("run_len")).over(mx))
      .groupBy(col("trace_id"))
      .agg(
        sum(col("run_len")).as("n_events"),
        count(lit(1)).as("n_runs"),
        max(col("run_len")).as("max_run"),
        min(when(col("run_len") === col("mxr"), col("action")))
          .as("run_action"))
      .select(col("trace_id"), col("n_events"), col("n_runs"),
        col("max_run"), col("run_action"),
        when(col("max_run") >= LoopRunMin, 1L).otherwise(0L)
          .as("is_looping"))
  }

  private val opTraceLoop = Op(
    "trace_loop",
    (s, dir) => traceLoop(traceRows(Tables.events(s, dir))),
    Some(traceCte + s""",
      isl AS (
        SELECT trace_id, action,
          ROW_NUMBER() OVER (PARTITION BY trace_id
              ORDER BY ts_us, event_id)
            - ROW_NUMBER() OVER (PARTITION BY trace_id, action
              ORDER BY ts_us, event_id) AS grp
        FROM trace),
      runs AS (
        SELECT trace_id, action, grp, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM isl GROUP BY 1, 2, 3),
      mx AS (
        SELECT *, MAX(run_len) OVER (PARTITION BY trace_id) AS mxr
        FROM runs)
      SELECT trace_id,
        CAST(SUM(run_len) AS BIGINT) AS n_events,
        CAST(COUNT(*) AS BIGINT) AS n_runs,
        CAST(MAX(run_len) AS BIGINT) AS max_run,
        MIN(CASE WHEN run_len = mxr THEN action END) AS run_action,
        CAST(CASE WHEN MAX(run_len) >= $LoopRunMin THEN 1 ELSE 0 END
          AS BIGINT) AS is_looping
      FROM mx GROUP BY trace_id"""))

  val ops: Seq[Op] =
    Seq(opAgentTrace, opTraceBigram, opToolLatency, opTraceReturns,
      opTraceLoop)
}
