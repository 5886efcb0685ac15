package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** graph_pagerank — link-graph centrality as a data-quality signal.
  *
  * The web-scale curation stacks rank the HOST GRAPH and use the rank
  * as a document-quality prior (Common Crawl publishes harmonic/PageRank
  * host rankings; CCNet/RefinedWeb-family pipelines filter or stratify
  * by them). The reference corpus has no hyperlinks, so the graph here
  * is the navigation graph its event log induces: consecutive events of
  * one user link the previous item to the next (`props.k` is the item),
  * exactly how a session-based "domain A leads to domain B" edge list
  * is mined from crawl logs. The op then runs PageRank (Page et al.
  * 1999) for a fixed [[PrIters]] rounds at damping 0.85.
  *
  * Everything is INTEGER fixed-point so the DuckDB oracle matches
  * bit-for-bit (the [[graft.functions.PorterSql]] precedent: the oracle
  * SQL is GENERATED, one CTE per iteration, same recurrence):
  *
  *   r_0(v)   = S div N
  *   r_{t+1}(v) = (15·(S div N) + 85·Σ_{e:u→v} w(e)·(r_t(u) div out(u)))
  *                div 100
  *
  * with S = 10^15. Bounds: per-source contributions sum to ≤ r_t(u), so
  * any node's inflow ≤ S and 85·inflow ≤ 8.5e16 — int64-safe at any
  * graph size (rank mass only shrinks: integer div truncation + dangling
  * nodes leak mass, the standard simplification — ORDERING, which is
  * what a quality filter consumes, is unaffected).
  *
  * Scale shape: transitions are one per-user window over the event log
  * (user_id is the natural partition key); the graph collapses to a
  * skinny weighted edge list ≪ the log. Each iteration is one
  * shuffle-join of edges to the rank frame on src plus one groupBy dst
  * — both co-partitioned on node keys; the edge frame (joined with
  * out-degrees once) is checkpointed so 8 rounds reuse one
  * materialization, and every round's rank frame is checkpointed to
  * keep lineage flat (the dedup_cluster pointer-jumping discipline).
  * Rank rows are 2 longs/node — a 1000-executor run shuffles node-count
  * rows, never the event log, after round 0.
  */
object Graph {

  /** Fixed-point scale for rank mass. */
  val PrScale = 1000000000000000L // 1e15

  /** Fixed iteration count — host-rank pipelines run a constant number
    * of sweeps, not to convergence (ordering stabilizes much earlier).
    */
  val PrIters = 8

  private def events(s: SparkSession, dir: String) = Tables(s, dir, "events")

  /** Weighted item→item transition edges from the event log. A
    * malformed props (no numeric `$.k`) is dropped BEFORE the lag
    * chain, so the surrounding transitions bridge over it — the same
    * rule the streaming twin (Streams.transitionDeltas) applies, which
    * is what keeps "folded stream deltas == batch edges" true on dirty
    * input; keeping the null in the chain would instead emit null-dst
    * edges that surface as a phantom node in the rank loop. */
  private[graft] def transitionEdges(ev: DataFrame): DataFrame = {
    val item = ev.select(col("user_id"), col("event_id"),
      expr("TRY_CAST(get_json_object(props, '$.k') AS INT)").as("it"))
      .filter(col("it").isNotNull)
    // event_id is unique and insertion-ordered: the one ORDER BY both
    // engines sort identically (ts has ns-vs-µs tie ambiguity)
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    item.withColumn("src", lag(col("it"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("it").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  private[graft] def pagerank(ev: DataFrame): DataFrame =
    pagerankEdges(transitionEdges(ev))

  /** The rank loop over an edge frame of the caller's provenance —
    * derived in-line ([[pagerank]], the oracled driver query) or the
    * reloaded `sink_graph` store (sources.GraphStore.pagerankFrom:
    * rank sweeps never re-window the event log).
    *
    * Loop shape (r18 optimization round — measured 65 jobs → 13, ~3 s
    * → ~1 s at sf0.1; the same restructuring is the at-scale win):
    *  - the OLD loop localCheckpointed every round, which in Spark
    *    4.1 erases partitioning (LogicalRDD comes back
    *    UnknownPartitioning), so every round re-exchanged BOTH join
    *    sides and re-broadcast the node count — 3 exchanges + 2
    *    broadcast jobs + 1 checkpoint job per round, and each AQE
    *    query stage is its own job;
    *  - NOW the 8 rounds build ONE lazy DAG: the checkpointed edge
    *    frame is repartitioned on src ONCE (ReuseExchange dedups the
    *    identical exchange across all rounds), each round's rank frame
    *    comes out of groupBy(dst) already hash-partitioned on the node
    *    key, so the next round's src⋈node join needs NO new exchange
    *    (shuffle_hash hint: no per-round sort of the edge side);
    *  - the dangling-node LEFT JOIN is folded into the same aggregate:
    *    every node contributes one (node, c=0, base=S div N) row per
    *    round, so sum(c) is the inflow (0 where none matched — exactly
    *    the old coalesce(cin, 0)) and max(base) recovers the teleport
    *    base (contrib rows carry base=0; base ≥ 1 whenever the graph
    *    is nonempty). Per round exactly ONE skinny exchange — the
    *    (dst, partial-sum) transpose that is fundamental to the
    *    recurrence — and zero joins beyond the rank attach.
    * Arithmetic is bit-identical to the oracle's recurrence: same
    * integer expressions, order-free sums.
    */
  private[graft] def pagerankEdges(edges: DataFrame): DataFrame = {
    val wOut = Window.partitionBy(col("src"))
    // one materialization feeds all rounds (outdeg via window: same
    // hash(src) pass that the old groupBy+self-join paid twice)
    val e = edges.withColumn("outdeg", sum(col("w")).over(wOut))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    val nN = nodes.agg(count(lit(1)).as("n"))
    // node frame carries the per-round teleport base S div N, computed
    // once (the old loop re-broadcast nN every round)
    val nodeBase = nodes.crossJoin(broadcast(nN))
      .select(col("node"), expr(s"$PrScale DIV n").as("base"))
      .localCheckpoint()
    val zeros = nodeBase.select(col("node").as("dst"), lit(0L).as("c"),
      col("base"))
    var ranks = nodeBase.select(col("node"), col("base").as("r"))
    for (_ <- 1 to PrIters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("w * (r DIV outdeg)").as("c"),
          lit(0L).as("base"))
      ranks = contrib.union(zeros)
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("cin"), max(col("base")).as("base"))
        .select(col("dst").as("node"),
          expr("(15 * base + 85 * cin) DIV 100").as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank_fp"))
  }

  private def iterSql(t: Int): String = {
    val prev = if (t == 1) "r0" else s"r${t - 1}"
    s"""r$t AS (
        SELECT nodes.node,
          CAST((15 * ($PrScale // nn.n) + 85 * COALESCE(c.cin, 0)) // 100
            AS BIGINT) AS r
        FROM nodes
        LEFT JOIN (
          SELECT e.dst, SUM(e.w * ($prev.r // e.outdeg)) AS cin
          FROM e JOIN $prev ON e.src = $prev.node
          GROUP BY e.dst) c ON nodes.node = c.dst
        CROSS JOIN nn)"""
  }

  private val opPagerank = Op(
    "graph_pagerank",
    (s, dir) => pagerank(events(s, dir)),
    Some(s"""
      WITH ev AS (
        SELECT user_id, event_id, it FROM (
          SELECT user_id, event_id,
            TRY_CAST(json_extract_string(props, '$$.k') AS INT) AS it
          FROM events WHERE json_valid(props))
        WHERE it IS NOT NULL),
      tr AS (
        SELECT LAG(it) OVER (PARTITION BY user_id ORDER BY event_id)
            AS src, it AS dst
        FROM ev),
      eg AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
             FROM tr WHERE src IS NOT NULL GROUP BY 1, 2),
      od AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg
             FROM eg GROUP BY 1),
      e AS (SELECT eg.src, eg.dst, eg.w, od.outdeg
            FROM eg JOIN od ON eg.src = od.src),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
      r0 AS (SELECT node, CAST($PrScale // n AS BIGINT) AS r
             FROM nodes CROSS JOIN nn),
      ${(1 to PrIters).map(iterSql).mkString(",\n      ")}
      SELECT node, r AS rank_fp FROM r$PrIters"""))

  // ---- q32_khop_reach: bounded k-hop neighborhoods (recursive CTE) ----
  // The ego-network primitive (k-hop reachability with min-hop
  // distance) — a standard graph feature for quality scoring — and
  // deliberately expressed through Spark 4's NEW `WITH RECURSIVE`
  // SQL surface so the library exercises it: the declarative BFS is
  // handed to Catalyst, which plans each recursion level as an
  // ordinary join (the "declare, don't hand-schedule" rule applied to
  // the newest surface). Spark's recursive CTEs support UNION ALL
  // only (no frontier dedup), so the depth bound is load-bearing: at
  // k=2 the path volume is Σ out-deg² per seed — fine on any real
  // navigation graph; UNBOUNDED reachability on a cyclic graph needs
  // the dedup_cluster pointer-jumping loop instead (documented, not
  // this op). min-hop folds at the end with a plain GROUP BY.
  val KhopDepth = 2
  val KhopSeeds = 3

  private val opKhop = Op(
    "q32_khop_reach",
    (s, dir) => {
      // the recursive plan references the edge view once per level
      // (anchor + seeds + each iteration's join) — materialize the
      // skinny edge list ONCE or the per-user event window re-runs
      // per reference (measured 5.4 s → 0.6 s at sf0.1)
      transitionEdges(events(s, dir)).select(col("src"), col("dst"))
        .localCheckpoint()
        .createOrReplaceTempView("graft_eg_khop")
      s.sql(s"""
        WITH RECURSIVE seeds AS (
          SELECT src AS seed FROM graft_eg_khop GROUP BY src
          ORDER BY src LIMIT $KhopSeeds),
        reach(seed, node, depth) AS (
          SELECT seed, seed AS node, 0 AS depth FROM seeds
          UNION ALL
          SELECT r.seed, e.dst, r.depth + 1
          FROM reach r JOIN graft_eg_khop e ON e.src = r.node
          WHERE r.depth < $KhopDepth)
        SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS hops
        FROM reach GROUP BY seed, node""")
    },
    Some(s"""
      WITH RECURSIVE ev AS (
        SELECT user_id, event_id, it FROM (
          SELECT user_id, event_id,
            TRY_CAST(json_extract_string(props, '$$.k') AS INT) AS it
          FROM events WHERE json_valid(props))
        WHERE it IS NOT NULL),
      tr AS (
        SELECT LAG(it) OVER (PARTITION BY user_id ORDER BY event_id)
            AS src, it AS dst
        FROM ev),
      eg AS (SELECT src, dst FROM tr WHERE src IS NOT NULL GROUP BY 1, 2),
      seeds AS (SELECT src AS seed FROM eg GROUP BY src
        ORDER BY src LIMIT $KhopSeeds),
      reach(seed, node, depth) AS (
        SELECT seed, seed AS node, 0 AS depth FROM seeds
        UNION ALL
        SELECT r.seed, e.dst, r.depth + 1
        FROM reach r JOIN eg e ON e.src = r.node
        WHERE r.depth < $KhopDepth)
      SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS hops
      FROM reach GROUP BY 1, 2"""))

  val ops: Seq[Op] = Seq(opPagerank, opKhop)
}
