package graft.operators

import graft.{Op, Tables}
import graft.Fns.{cents, centsSql, sumMoney, sumMoneySql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core, part 2 (SURVEY.md §2 rows q15–q21): the remaining
  * classic TPC-H operator shapes — global-max selection, HAVING,
  * correlated scalar subqueries (decorrelated to a join, which is what
  * a 1000-executor plan wants anyway), disjunctive pushdown, and
  * chained semi/anti joins.
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private def revenueExpr =
    sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0
  private def revenueSql =
    s"(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) / 10000.0)"

  // ---- q15_top_supplier: global max over an aggregate (TPC-H Q15) ----
  private val q15 = Op(
    "q15_top_supplier",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(revenueExpr.as("revenue"))
      val mx = rev.agg(max(col("revenue")).as("mx"))
      t(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(mx), col("revenue") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("revenue"))
    },
    Some(s"""
      WITH rev AS (
        SELECT l_suppkey, $revenueSql AS revenue FROM lineitem GROUP BY 1)
      SELECT s_suppkey, s_name, revenue
      FROM supplier, rev
      WHERE s_suppkey = l_suppkey
        AND revenue = (SELECT MAX(revenue) FROM rev)"""))

  // ---- q16_supplier_cnt: distinct-count after join (TPC-H Q16 shape) ----
  private val q16 = Op(
    "q16_supplier_cnt",
    (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_type") =!= "PROMO" && col("p_size").isin(5, 10, 15, 20))
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt")),
    Some("""
      SELECT p_brand, p_type, p_size,
        COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM part, lineitem
      WHERE p_partkey = l_partkey AND p_type <> 'PROMO'
        AND p_size IN (5, 10, 15, 20)
      GROUP BY p_brand, p_type, p_size"""))

  // ---- q17_small_qty: correlated scalar subquery, decorrelated ----
  // revenue from lines below 20% of their part's average quantity
  // (TPC-H Q17 shape). The correlated subquery becomes a per-part agg
  // joined back — the only scalable plan at 100 TB.
  private val q17 = Op(
    "q17_small_qty",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val partAvg = l.groupBy(col("l_partkey").as("ap_partkey"))
        .agg(((sum(cents(col("l_quantity"))) / 100.0) / count(lit(1)))
          .as("avg_qty"))
      val p = t(s, dir, "part").filter(col("p_brand") === "Brand#5")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(sumMoney(col("l_extendedprice")).as("small_qty_revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""
      SELECT ${sumMoneySql("l_extendedprice")} AS small_qty_revenue,
        COUNT(*) AS n_lines
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#5'
        AND l_quantity < 0.2 * (
          SELECT (SUM(${centsSql("l2.l_quantity")}) / 100.0) / COUNT(*)
          FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)"""))

  // ---- q18_large_orders: HAVING + join-back (TPC-H Q18 shape) ----
  private val q18 = Op(
    "q18_large_orders",
    (s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg((sum(cents(col("l_quantity"))) / 100.0).as("total_qty"))
        .filter(col("total_qty") > 250)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("total_qty"))
    },
    Some(s"""
      SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
      FROM orders, customer,
        (SELECT l_orderkey, (SUM(${centsSql("l_quantity")}) / 100.0) AS total_qty
         FROM lineitem GROUP BY l_orderkey HAVING (SUM(${centsSql("l_quantity")}) / 100.0) > 250) big
      WHERE o_orderkey = big.l_orderkey AND o_custkey = c_custkey"""))

  // ---- q19_disjunctive: OR-of-ANDs predicate (TPC-H Q19 shape) ----
  private val q19 = Op(
    "q19_disjunctive",
    (s, dir) => {
      val cond =
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 35))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(revenueExpr.as("revenue"), count(lit(1)).as("n_lines"))
    },
    Some(s"""
      SELECT $revenueSql AS revenue, COUNT(*) AS n_lines
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND (
           (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15)
        OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25)
        OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35))"""))

  // ---- q20_semi_over_join: EXISTS over a join (TPC-H Q20 shape) ----
  private val q20 = Op(
    "q20_semi_over_join",
    (s, dir) => {
      val bigParts = t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_size") > 40),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .filter(col("s_acctbal") > 0)
        .join(bigParts, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    },
    Some("""
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
      WHERE s_acctbal > 0 AND EXISTS (
        SELECT 1 FROM lineitem, part
        WHERE l_suppkey = s_suppkey AND l_partkey = p_partkey
          AND p_size > 40)"""))

  // ---- q21_semi_anti_chain: EXISTS ... AND NOT EXISTS (Q21 shape) ----
  // customers with a returned line but no completed ('F') order
  private val q21 = Op(
    "q21_semi_anti_chain",
    (s, dir) => {
      val returned = t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"))
      val completed = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("f_custkey"))
      t(s, dir, "customer")
        .join(returned, col("c_custkey") === col("o_custkey"), "left_semi")
        .join(completed, col("c_custkey") === col("f_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders, lineitem
              WHERE o_custkey = c_custkey AND l_orderkey = o_orderkey
                AND l_returnflag = 'R')
        AND NOT EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')"""))

  // ---- q22_approx_sketch: HLL++ and quantile-sketch aggregates ----
  // The approximate path for q10-style questions at 100 TB: fixed-size
  // sketches, one pass, mergeable map-side. rows-only (approx results
  // are engine-specific by design); the spec bounds error vs exact.
  // Output is all-scalar (q50/q95 via element_at, not array<double>) so
  // the driver's pandas row compare can sort/hash the frame.
  private val q22 = Op(
    "q22_approx_sketch",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
            .as("pq"),
          count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("approx_parts"),
          element_at(col("pq"), 1).as("price_q50"),
          element_at(col("pq"), 2).as("price_q95"),
          col("cnt")),
    None)

  // ---- q23_pivot: wide pivot of event counts per day ----
  // Explicit value list keeps the pivot a single pass (no extra
  // distinct-values job) and the output schema deterministic.
  private val q23 = Op(
    "q23_pivot",
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      graft.Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
    },
    Some("""
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY 1"""))

  // ---- q24_cube: full CUBE grouping sets (ROLLUP's sibling, q9) ----
  // One pass computes all 2^k grouping-set combinations with map-side
  // partial aggregation — the expand happens before the single shuffle.
  private val q24 = Op(
    "q24_cube",
    (s, dir) =>
      graft.Tables(s, dir, "customer")
        .cube(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          graft.Fns.sumMoney(col("c_acctbal")).as("sum_bal")),
    Some(s"""
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt,
        ${graft.Fns.sumMoneySql("c_acctbal")} AS sum_bal
      FROM customer GROUP BY CUBE(c_nationkey, c_mktsegment)"""))

  // ---- q25_set_ops: INTERSECT / EXCEPT over key sets ----
  // Set semantics (deduplicating) on the customer-key level: customers
  // who ordered in BOTH 3-priority and 1-priority classes, minus those
  // who ever had an F-status order — Spark intersect/except lower to
  // left-semi/left-anti joins after distinct, so both prune to key
  // columns before any shuffle.
  private val q25 = Op(
    "q25_set_ops",
    (s, dir) => {
      val o = graft.Tables(s, dir, "orders")
      val hi = o.filter(col("o_orderpriority").startsWith("1"))
        .select(col("o_custkey"))
      val lo = o.filter(col("o_orderpriority").startsWith("3"))
        .select(col("o_custkey"))
      val flagged = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      hi.intersect(lo).except(flagged)
        .select(col("o_custkey").as("custkey"))
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '1%'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '3%'
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'"""))

  // ---- q26_asof_join: each purchase ← latest prior view, per user ----
  // The classic operator Spark lacks natively (DuckDB: ASOF JOIN; Pandas:
  // merge_asof). The Spark-first shape is NOT a join at all: both sides
  // union into one stream, and a per-user window ordered by
  // (ts, side) carries the last non-null view forward onto each
  // purchase — ONE shuffle on user_id, no range join (whose naive form
  // is O(views × purchases) per user), no equality key to hash on.
  // Equal timestamps count as "prior" (DuckDB's >= semantics): views
  // sort before purchases at a tie. The view side is first deduped to
  // one row per (user, ts) — max event_id wins — because asof semantics
  // need a unique right key at each instant.
  private val q26 = Op(
    "q26_asof_join",
    (s, dir) => {
      val e = Tables.events(s, dir)
      // max_by keeps the view-side dedup a HASH aggregate with map-side
      // partial combine; max(struct(...)) planned as SortAggregate,
      // costing two extra per-partition sorts on the fact scan.
      // CONTRACT: event_id is unique per row (the events generator's
      // primary key), so max_by's ordering key never ties and the pick
      // is deterministic. A composite tie-break (struct ordering key)
      // would force this back to SortAggregate — hash agg buffers must
      // stay primitive — so uniqueness is the cheaper invariant; it is
      // also what v_id's own max() already relies on to pair with
      // v_value.
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("v_id"),
          max_by(col("value"), col("event_id")).as("v_value"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
          col("value").as("p_value"))
      // v_ts is materialized on the view side BEFORE the union: every
      // carry-forward below is then a bare column reference, so all
      // three last()s collapse into ONE Window node (a computed
      // last(when(...)) argument used to split out a second full pass
      // over each user partition).
      val tagged = v.select(col("user_id"), col("ts"), lit(0).as("side"),
          lit(null).cast("long").as("p_id"), lit(null).cast("double").as("p_value"),
          col("v_id"), col("v_value"), col("ts").as("v_ts"))
        .unionByName(p.select(col("user_id"), col("ts"), lit(1).as("side"),
          col("p_id"), col("p_value"),
          lit(null).cast("long").as("v_id"), lit(null).cast("double").as("v_value"),
          lit(null).cast("timestamp").as("v_ts")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      tagged
        .select(col("user_id"), col("side"), col("p_id"), col("ts"),
          col("p_value"),
          last(col("v_id"), ignoreNulls = true).over(w).as("av_id"),
          last(col("v_value"), ignoreNulls = true).over(w).as("av_value"),
          last(col("v_ts"), ignoreNulls = true).over(w).as("av_ts"))
        .filter(col("side") === 1)
        .select(col("user_id"), col("p_id"), col("ts").as("p_ts"), col("p_value"),
          col("av_id").as("v_id"), col("av_value").as("v_value"),
          (unix_micros(col("ts").cast("timestamp")) - unix_micros(col("av_ts").cast("timestamp"))).as("gap_us"))
    },
    Some("""
      WITH v AS (
        SELECT user_id, ts, MAX(event_id) AS v_id,
          arg_max(value, event_id) AS v_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      p AS (SELECT user_id, ts, event_id AS p_id, value AS p_value
            FROM events WHERE event_type = 'purchase')
      SELECT p.user_id, p.p_id, p.ts AS p_ts, p.p_value, v.v_id, v.v_value,
        epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts"""))

  // ---- q27_range_join: views within the hour before each purchase ----
  // The other operator Spark lacks a native physical strategy for: an
  // interval/range join. Written as a raw inequality join Spark picks
  // BroadcastNestedLoopJoin — O(|views|·|purchases|) per user and a
  // broadcast of a fact table. The scale pattern is BINNING: both
  // sides bucket ts into window-width bins, each purchase probes its
  // own bin and the one before (2 skinny probe rows), the join becomes
  // an EQUALITY hash join on (user_id, bin), and the exact range
  // predicate filters the ~2× candidate surplus. Money sums ride exact
  // integer cents per the oracle convention.
  val RangeUs = 3600L * 1000000L // 1 h window, µs

  private val q27 = Op(
    "q27_range_join",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), unix_micros(col("ts").cast("timestamp")).as("v_us"),
          cents(col("value")).as("v_cents"))
        .withColumn("vbin", expr(s"v_us DIV $RangeUs"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"),
          unix_micros(col("ts").cast("timestamp")).as("p_us"))
        .withColumn("pbin", explode(array(
          expr(s"p_us DIV $RangeUs - 1"), expr(s"p_us DIV $RangeUs"))))
      p.join(v,
          col("user_id") === col("v_user") && col("pbin") === col("vbin") &&
            col("v_us") <= col("p_us") && col("p_us") - col("v_us") <= RangeUs,
          "left")
        .groupBy(col("user_id"), col("p_id"), col("p_ts"))
        .agg(count(col("v_us")).as("n_views_1h"),
          (coalesce(sum(col("v_cents")), lit(0L)) / 100.0).as("sum_view_value"))
    },
    Some(s"""
      WITH v AS (SELECT user_id, ts, ${centsSql("value")} AS v_cents
                 FROM events WHERE event_type = 'view'),
      p AS (SELECT user_id, event_id AS p_id, ts
            FROM events WHERE event_type = 'purchase')
      SELECT p.user_id, p.p_id, p.ts AS p_ts,
        COUNT(v.ts) AS n_views_1h,
        COALESCE(CAST(SUM(v.v_cents) AS BIGINT), 0) / 100.0 AS sum_view_value
      FROM p LEFT JOIN v ON p.user_id = v.user_id
        AND v.ts <= p.ts AND epoch_us(p.ts) - epoch_us(v.ts) <= $RangeUs
      GROUP BY 1, 2, 3"""))

  // ---- q28_skew_salted: hot-key aggregation through the salt path ----
  // The skew utility (operators.Skew, SURVEY §4) promoted into the
  // graded query surface: l_returnflag is a genuinely hot key (3
  // values over the whole table), the canonical case where a plain
  // groupBy lands each key's full row set on ONE reducer. The salted
  // two-level plan fans every hot key over `salts` partial reducers
  // first; both shuffles carry only partial rows. Same answer as the
  // plain aggregation — the oracle IS the plain GROUP BY, so the
  // driver's hash compare proves salting changes the plan, not the
  // result (SkewSpec pins the same equality in-process).
  private val q28 = Op(
    "q28_skew_salted",
    (s, dir) =>
      Skew.saltedSumCount(Tables(s, dir, "lineitem"),
          Seq("l_returnflag"), cents(col("l_extendedprice")))
        .select(col("l_returnflag"),
          (col("sum_value") / 100.0).as("sum_price"), col("cnt")),
    Some(s"""
      SELECT l_returnflag,
        ${sumMoneySql("l_extendedprice")} AS sum_price,
        CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1"""))

  // ---- q31_compact_latest: upsert compaction (latest row per key) ----
  // The lakehouse maintenance shape: an append log of events compacts
  // to the newest record per (user, event_type) — SCD-1 / CDC upsert
  // resolution. The canonical rank-window plan buffers each key's full
  // history in one window task; this runs through the TopKPerKey
  // two-phase heap at k = 1 (one surviving row per key per partition
  // reaches the shuffle — at 100 TB the difference between compaction
  // bounded by keys and compaction bounded by history length).
  // Recency ties break by event_id DESC (latest writer wins),
  // compared in exact epoch-µs (unix_micros / DuckDB epoch_us — the
  // q26 ns-truncation convention).
  private val q31 = Op(
    "q31_compact_latest",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      graft.plans.TopK.perKey(e, Seq("user_id", "event_type"),
          Seq("ts_us" -> graft.plans.TopK.Desc,
            "event_id" -> graft.plans.TopK.Desc), 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts_us"), round(col("value"), 6).as("value"))
    },
    Some("""
      WITH r AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, event_type, event_id, ts_us,
        ROUND(value, 6) AS value
      FROM r WHERE rn = 1"""))

  // ---- q29_sketch_merge: mergeable HLL sketches, shard → union ----
  // The incremental-stats architecture 100 TB demands: per-shard
  // DataSketches HLL sketches built in one pass, then UNIONED to any
  // rollup without rescanning — how an engine maintains NDV stats over
  // a growing corpus (per-day/per-partition sketches, merged on read).
  // The sketch state is max-per-register, so union is associative,
  // commutative, and partition-order-independent: the merged estimate
  // is bit-deterministic and EQUALS the single-pass sketch over the
  // whole table at the same lgK (spec-asserted, plus a tolerance bound
  // vs exact NDV). Shard frame is checkpointed: 3 sketch rows feed
  // both the per-shard estimates and the union — one table scan total.
  // Rows-only: the sketch binary is a DataSketches detail, not
  // portable SQL.
  val SketchLgK = 14

  private val q29 = Op(
    "q29_sketch_merge",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val shard = li.groupBy(col("l_returnflag"))
        .agg(expr(s"hll_sketch_agg(l_partkey, $SketchLgK)").as("sk"),
          count(lit(1)).as("n_rows"))
        .localCheckpoint()
      val perFlag = shard.select(col("l_returnflag"), col("n_rows"),
        expr("hll_sketch_estimate(sk)").as("est_parts"))
      val global = shard
        .agg(sum(col("n_rows")).as("n_rows"),
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_parts"))
        .select(lit("ALL").as("l_returnflag"), col("n_rows"),
          col("est_parts"))
      perFlag.union(global)
    },
    None)

  // ---- q30_full_outer: reconciliation via FULL OUTER join ----
  // The audit/reconciliation shape (spend ledger vs activity log):
  // both sides pre-aggregate to skinny per-key rows FIRST — the outer
  // join then shuffles two already-reduced frames, never the fact
  // tables — and presence comes from join-side nullness. Completes the
  // join-type coverage of the surface (inner/broadcast/semi/anti/
  // asof/range/salted … + full outer).
  private val q30 = Op(
    "q30_full_outer",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .groupBy(col("o_custkey").as("cust_id"))
        .agg(count(lit(1)).as("n_orders"),
          sumMoney(col("o_totalprice")).as("sum_spend"))
      val e = Tables.events(s, dir)
        .groupBy(col("user_id").as("cust_id"))
        .agg(count(lit(1)).as("n_events"))
      o.join(e, Seq("cust_id"), "full_outer")
        .select(col("cust_id"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("sum_spend"), lit(0.0)).as("sum_spend"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          when(col("n_orders").isNotNull && col("n_events").isNotNull, "both")
            .when(col("n_orders").isNotNull, "orders_only")
            .otherwise("events_only").as("presence"))
    },
    Some(s"""
      WITH o AS (
        SELECT o_custkey AS cust_id, CAST(COUNT(*) AS BIGINT) AS n_orders,
          ${sumMoneySql("o_totalprice")} AS sum_spend
        FROM orders GROUP BY 1),
      e AS (
        SELECT user_id AS cust_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1)
      SELECT COALESCE(o.cust_id, e.cust_id) AS cust_id,
        COALESCE(o.n_orders, 0) AS n_orders,
        COALESCE(o.sum_spend, 0.0) AS sum_spend,
        COALESCE(e.n_events, 0) AS n_events,
        CASE WHEN o.cust_id IS NOT NULL AND e.cust_id IS NOT NULL THEN 'both'
             WHEN o.cust_id IS NOT NULL THEN 'orders_only'
             ELSE 'events_only' END AS presence
      FROM o FULL OUTER JOIN e ON o.cust_id = e.cust_id"""))

  val ops: Seq[Op] =
    Seq(q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28,
      q29, q30, q31)
}
