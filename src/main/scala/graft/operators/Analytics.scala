package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse analytics over the event log — the classic patterns every
  * OLAP engine ships as examples and every product-analytics stack
  * runs at scale: SCD2 change history, funnel conversion, cohort
  * retention, and degree-oriented triangle counting. All four are
  * fully ANSI-SQL-expressible, so each carries a DuckDB oracle and is
  * hash-proven, and all four move only SKINNY event projections
  * (ids/types/days) — the props/value payloads never enter a shuffle.
  *
  * Ordering convention: `event_id` is unique and insertion-ordered
  * (the transitionEdges note — `ts` has ns-vs-µs tie ambiguity across
  * engines), so every sequence-sensitive window here orders by
  * event_id.
  */
object Analytics {

  private def events(s: SparkSession, dir: String) = Tables.events(s, dir)

  // ---- q33_scd2: slowly-changing-dimension type-2 history ----
  // The warehouse changelog fold: each user's event stream is a series
  // of state transitions (event_type = the state); SCD2 keeps one row
  // per CHANGE with a validity interval [valid_from, valid_to) and an
  // is_current flag — q31_compact_latest's "latest" generalized to the
  // full history. Two per-user windows (lag to drop no-op repeats,
  // lead on the SURVIVORS for the interval end); per-user partitions
  // shuffle skinny (user, id, type) rows and scale with users, not
  // history length per user beyond the sort.
  private[graft] def scd2(ev: DataFrame): DataFrame = {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      ev
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to_x", lead(col("event_id"), 1).over(byUser))
        .select(col("user_id"), col("event_type").as("state"),
          col("event_id").as("valid_from"),
          coalesce(col("valid_to_x"), lit(-1L)).as("valid_to"),
          when(col("valid_to_x").isNull, 1L).otherwise(0L).as("is_current"))
  }

  private val opScd2 = Op(
    "q33_scd2",
    (s, dir) => scd2(events(s, dir)),
    Some("""
      WITH ch AS (
        SELECT user_id, event_id, event_type,
          LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
            AS prev
        FROM events),
      surv AS (
        SELECT user_id, event_id, event_type,
          LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
            AS valid_to_x
        FROM ch WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type AS state, event_id AS valid_from,
        COALESCE(valid_to_x, -1) AS valid_to,
        CAST(CASE WHEN valid_to_x IS NULL THEN 1 ELSE 0 END AS BIGINT)
          AS is_current
      FROM surv"""))

  // ---- q34_funnel: ordered-step conversion funnel ----
  // "view → click → purchase, IN ORDER": each later step's earliest
  // qualifying event must come after the previous step's. ONE pass:
  // a per-user running-min window carries "earliest view so far" /
  // "earliest qualifying click so far", so a row can decide locally
  // whether it advances the funnel ("click after the first view" ⟺
  // "click id > running min view id"), and the per-user roll-up
  // reuses the window's hash partitioning — one scan, one user
  // shuffle, versus the naive per-step shape (one conditional agg +
  // join PER STEP = step-count scans of the event log; the plan
  // census read 7 scans / 8 shuffles for the 3-step funnel before
  // this rewrite, 1 scan / 2 shuffles after).
  private[graft] def funnel(ev: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("v_run",
          min(when(col("event_type") === "view", col("event_id"))).over(w))
        .withColumn("c_cand",
          when(col("event_type") === "click" && col("v_run") < col("event_id"),
            col("event_id")))
        .withColumn("c_run", min(col("c_cand")).over(w))
        .withColumn("p_cand",
          when(col("event_type") === "purchase" &&
            col("c_run") < col("event_id"), col("event_id")))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("event_id"))).as("v_x"),
          min(col("c_cand")).as("c_x"),
          min(col("p_cand")).as("p_x"))
        .select(col("user_id"),
          coalesce(col("v_x"), lit(-1L)).as("v_id"),
          coalesce(col("c_x"), lit(-1L)).as("c_id"),
          coalesce(col("p_x"), lit(-1L)).as("p_id"),
          when(col("p_x").isNotNull, 3L)
            .when(col("c_x").isNotNull, 2L)
            .when(col("v_x").isNotNull, 1L)
            .otherwise(0L).as("stage"))
  }

  private val opFunnel = Op(
    "q34_funnel",
    (s, dir) => funnel(events(s, dir)),
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type FROM events),
      v AS (SELECT user_id, MIN(event_id) AS v_id FROM e
        WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, v.v_id, MIN(e.event_id) AS c_id
        FROM e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.event_id > v.v_id
        GROUP BY 1, 2),
      p AS (SELECT e.user_id, c.c_id, MIN(e.event_id) AS p_id
        FROM e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.event_id > c.c_id
        GROUP BY 1, 2)
      SELECT u.user_id,
        COALESCE(v.v_id, -1) AS v_id,
        COALESCE(c.c_id, -1) AS c_id,
        COALESCE(p.p_id, -1) AS p_id,
        CAST(CASE WHEN p.p_id IS NOT NULL THEN 3
                  WHEN c.c_id IS NOT NULL THEN 2
                  WHEN v.v_id IS NOT NULL THEN 1
                  ELSE 0 END AS BIGINT) AS stage
      FROM (SELECT DISTINCT user_id FROM e) u
      LEFT JOIN v USING (user_id)
      LEFT JOIN c USING (user_id)
      LEFT JOIN p USING (user_id)"""))

  // ---- q35_retention: cohort retention matrix ----
  // Users grouped by first-active day; for each (cohort_day, day
  // offset) the count of distinct users active that day — the
  // product-analytics retention triangle. Active-day projection is
  // distinct'd FIRST so the cohort join and the final count move one
  // row per (user, day), not per event.
  private[graft] def retention(ev: DataFrame): DataFrame = {
      val days = ev
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val cohort = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      days.join(cohort, Seq("user_id"))
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
  }

  private val opRetention = Op(
    "q35_retention",
    (s, dir) => retention(events(s, dir)),
    Some("""
      WITH days AS (SELECT DISTINCT user_id,
          CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events),
      cohort AS (SELECT user_id, MIN(day) AS cohort_day
        FROM days GROUP BY 1)
      SELECT c.cohort_day,
        CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT) AS day_offset,
        CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
      FROM days d JOIN cohort c USING (user_id)
      GROUP BY 1, 2"""))

  // ---- q36_triangles: degree-oriented triangle counting ----
  // The canonical bounded-skew triangle algorithm (node iterator with
  // degree orientation): orient every undirected edge from its
  // lower-(degree, id) endpoint to the higher, so each wedge is
  // enumerated at exactly one vertex and a hub of degree d generates
  // O(d) oriented OUT-edges only after orientation caps its out-degree
  // at ~√m — the join volume is O(m^1.5) worst case instead of Σd²
  // (which a power-law hub makes quadratic). Wedges (a→b, a→c) close
  // into triangles via one join against the oriented edge set; each
  // triangle is found exactly once and re-attributed to its three
  // corners for the per-node count. Graph = the pagerank family's
  // item→item transition edges, undirected and deduped.
  private[graft] def triangles(ev: DataFrame): DataFrame = {
      val und = Graph.transitionEdges(ev)
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
      val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      val withDeg = und
        .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
      // orient lower (deg, id) → higher; ties broken by id so the
      // orientation is a strict total order
      val oriented = withDeg.select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"))
        .localCheckpoint() // read three times (both wedge legs + close)
      val wedges = oriented.as("e1")
        .join(oriented.as("e2"),
          col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
        .select(col("e1.lo").as("x"), col("e1.hi").as("y"),
          col("e2.hi").as("z"))
      // close wedges on the ID-CANONICAL pair key, not the oriented
      // endpoints: the closing edge {y, z} may be oriented either way
      // (orientation is by degree), and expressing that as an OR of
      // two equi-conditions forces a nested-loop join — wedges ×
      // edges, the exact quadratic this op exists to avoid (measured:
      // BroadcastNestedLoopJoin, 7.1 s at sf0.1; the canonical-key
      // equi-join hash-partitions both sides instead)
      val ek = oriented.select(
        least(col("lo"), col("hi")).as("p1"),
        greatest(col("lo"), col("hi")).as("p2"))
      val tris = wedges
        .withColumn("p1", least(col("y"), col("z")))
        .withColumn("p2", greatest(col("y"), col("z")))
        .join(ek, Seq("p1", "p2"))
        .select(col("x"), col("y"), col("z"))
      tris.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("n_triangles"))
  }

  private val opTriangles = Op(
    "q36_triangles",
    (s, dir) => triangles(events(s, dir)),
    Some("""
      WITH item AS (
        SELECT user_id, event_id,
          TRY_CAST(json_extract_string(props, '$.k') AS INT) AS it
        FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT)
          IS NOT NULL),
      tr AS (
        SELECT LAG(it) OVER (PARTITION BY user_id ORDER BY event_id) AS src,
          it AS dst
        FROM item),
      und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM tr WHERE src IS NOT NULL AND src <> dst),
      deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
          SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
        GROUP BY 1),
      o AS (
        SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
            THEN a ELSE b END AS lo,
          CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
            THEN b ELSE a END AS hi
        FROM und JOIN deg da ON da.n = a JOIN deg db ON db.n = b),
      w AS (
        SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
        FROM o e1 JOIN o e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
      ek AS (SELECT LEAST(lo, hi) AS p1, GREATEST(lo, hi) AS p2 FROM o),
      tris AS (
        SELECT w.x, w.y, w.z FROM w JOIN ek
        ON ek.p1 = LEAST(w.y, w.z) AND ek.p2 = GREATEST(w.y, w.z))
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS node FROM tris
        UNION ALL SELECT y FROM tris
        UNION ALL SELECT z FROM tris)
      GROUP BY 1"""))

  // ---- q37_grouping_sets: non-hierarchical multi-dimension slices ----
  // The grouping-sets shape ROLLUP (q9) and CUBE (q24) cannot express:
  // two DISJOINT one-dimension slices of the event log — per-type and
  // per-user-bucket daily value totals — computed in ONE pass. Catalyst
  // lowers this to a single Expand (×2) over skinny (type, bucket,
  // cents) rows feeding one hash aggregate with map-side partial
  // combine; two separate groupBys would scan the table twice. The
  // grouping() markers disambiguate which slice a row belongs to —
  // NULL-vs-grouped-out is otherwise ambiguous on nullable dims.
  private[graft] def groupingSlices(ev: DataFrame): DataFrame =
    ev.select(col("event_type"), (col("user_id") % 10L).as("user_bucket"),
        graft.Fns.cents(col("value")).as("cents"))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("user_bucket"))),
        col("event_type"), col("user_bucket"))
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("cnt"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("user_bucket")).cast("long").as("g_bucket"))

  private val opGroupingSets = Op(
    "q37_grouping_sets",
    (s, dir) => groupingSlices(events(s, dir)),
    Some(s"""
      SELECT event_type, user_bucket,
        CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS cnt,
        CAST(GROUPING(event_type) AS BIGINT) AS g_type,
        CAST(GROUPING(user_bucket) AS BIGINT) AS g_bucket
      FROM (SELECT event_type, user_id % 10 AS user_bucket,
              ${graft.Fns.centsSql("value")} AS cents FROM events)
      GROUP BY GROUPING SETS ((event_type), (user_bucket))"""))

  // ---- q38_window_range: RANGE-frame running aggregates ----
  // The window-frame mode q6's rank/sum (default ROWS-ish frames) and
  // q34's running-min never exercise: a VALUE-bounded sliding frame —
  // per user, the sum/count of event value over the trailing
  // event_id window [current−100, current]. RANGE frames differ from
  // ROWS exactly when ids are sparse per user (they are here: a user
  // holds ~1/users of the global id sequence), so a ROWS(100) rewrite
  // would be wrong, not just slower — the oracle pins the semantics.
  // Scale: per-user hash partitions, one sort inside each — the
  // standard windowed-analytics shape; the frame is value-bounded so
  // WindowExec holds only the sliding buffer, never the partition's
  // tail.
  val RangeWidth = 100L

  private[graft] def windowRange(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rangeBetween(-RangeWidth, Window.currentRow)
    ev.select(col("user_id"), col("event_id"),
        graft.Fns.cents(col("value")).as("cents"))
      .withColumn("trail_cents", sum(col("cents")).over(w))
      .withColumn("trail_n", count(lit(1)).over(w))
  }

  private val opWindowRange = Op(
    "q38_window_range",
    (s, dir) => windowRange(events(s, dir)),
    Some(s"""
      SELECT user_id, event_id,
        ${graft.Fns.centsSql("value")} AS cents,
        CAST(SUM(${graft.Fns.centsSql("value")}) OVER (
          PARTITION BY user_id ORDER BY event_id
          RANGE BETWEEN $RangeWidth PRECEDING AND CURRENT ROW)
          AS BIGINT) AS trail_cents,
        CAST(COUNT(*) OVER (
          PARTITION BY user_id ORDER BY event_id
          RANGE BETWEEN $RangeWidth PRECEDING AND CURRENT ROW)
          AS BIGINT) AS trail_n
      FROM events"""))

  // ---- q39_unpivot: wide → long melt in ONE Expand pass ----
  // The inverse of q23_pivot and the missing reshape primitive: four
  // lineitem measure columns melted to (measure, cents) long format and
  // re-aggregated per measure. Spark's native `unpivot` lowers to a
  // single Expand (×4) over one scan — the hand-written alternative
  // (four per-measure groupBy branches unioned) reads the table four
  // times; at 100 TB the melt IS the optimization. Measures ride as
  // exact long cents (the Fns.cents convention) so sums are
  // order-independent across engines.
  private[graft] def unpivotMeasures(li: DataFrame): DataFrame = {
    import graft.Fns.cents
    li.select(
        cents(col("l_quantity")).as("quantity"),
        cents(col("l_extendedprice")).as("extendedprice"),
        cents(col("l_discount")).as("discount"),
        cents(col("l_tax")).as("tax"))
      .unpivot(
        Array.empty[org.apache.spark.sql.Column],
        Array(col("quantity"), col("extendedprice"), col("discount"),
          col("tax")),
        "measure", "cents")
      .groupBy(col("measure"))
      .agg(sum(col("cents")).as("sum_cents"),
        count(lit(1)).as("cnt"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
  }

  private val opUnpivot = Op(
    "q39_unpivot",
    (s, dir) => unpivotMeasures(Tables(s, dir, "lineitem")),
    Some(s"""
      WITH wide AS (SELECT
          ${graft.Fns.centsSql("l_quantity")} AS quantity,
          ${graft.Fns.centsSql("l_extendedprice")} AS extendedprice,
          ${graft.Fns.centsSql("l_discount")} AS discount,
          ${graft.Fns.centsSql("l_tax")} AS tax
        FROM lineitem),
      long AS (
        UNPIVOT wide ON quantity, extendedprice, discount, tax
        INTO NAME measure VALUE cents)
      SELECT measure, CAST(SUM(cents) AS BIGINT) AS sum_cents,
        COUNT(*) AS cnt,
        CAST(MIN(cents) AS BIGINT) AS min_cents,
        CAST(MAX(cents) AS BIGINT) AS max_cents
      FROM long GROUP BY 1"""))

  // ---- q40_gap_fill: LOCF forward fill via IGNORE NULLS ----
  // The time-series gap-fill kernel (last observation carried forward):
  // only 'purchase' events carry a price; every event row gets the
  // LATEST price observed so far for its user via
  // last(col, ignoreNulls) over an unbounded-preceding ROWS frame —
  // the frame only ever grows, so WindowExec streams each partition in
  // one pass holding O(1) state (contrast a self-join "latest earlier
  // purchase" shape: a per-row range probe). Rows before a user's
  // first purchase report -1 (the no-observation sentinel; NULL would
  // also hash differently across engines' string forms).
  private[graft] def gapFill(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"),
        when(col("event_type") === "purchase",
          graft.Fns.cents(col("value"))).as("p_cents"))
      .withColumn("last_price",
        coalesce(last(col("p_cents"), ignoreNulls = true).over(w), lit(-1L)))
      .select(col("user_id"), col("event_id"), col("last_price"))
  }

  private val opGapFill = Op(
    "q40_gap_fill",
    (s, dir) => gapFill(events(s, dir)),
    Some(s"""
      SELECT user_id, event_id,
        COALESCE(LAST_VALUE(p_cents IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
          AS last_price
      FROM (SELECT user_id, event_id,
          CASE WHEN event_type = 'purchase'
            THEN ${graft.Fns.centsSql("value")} END AS p_cents
        FROM events)"""))

  def ops: Seq[Op] =
    Seq(opScd2, opFunnel, opRetention, opTriangles, opGroupingSets,
      opWindowRange, opUnpivot, opGapFill)
}
