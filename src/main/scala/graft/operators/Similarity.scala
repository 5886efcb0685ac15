package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors). Two paths per SURVEY.md §2:
  *
  *  - ann_cosine_topk: brute-force baseline. Queries are broadcast, the
  *    candidate scan stays narrow; per-query top-k via window (the 100 TB
  *    variant keeps per-partition heaps — see ann_ivf for the pruning
  *    path). Dot products cast every float to double BEFORE multiplying
  *    and accumulate left-to-right, matching the oracle bit-for-bit.
  *  - ann_ivf: IVF-style pruning. Per-label centroids (a k-means
  *    assignment step computed distributively), queries probe only their
  *    nearest centroid's bucket — candidate volume drops by ~k×.
  */
object Similarity {

  private val dotExpr =
    "aggregate(zip_with(q_emb, c_emb, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (acc, x) -> acc + x)"
  private val normExpr =
    "sqrt(aggregate(embedding, 0D, (acc, x) -> acc + cast(x AS double) * cast(x AS double)))"

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings").withColumn("norm", expr(normExpr))

  // ---- ann_cosine_topk ----
  private val opBrute = Op(
    "ann_cosine_topk",
    (s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
        // native codegen expression — one fused pass (plans.CosineSimilarity)
        .withColumn("cos", round(expr("graft_cosine(q_emb, c_emb)"), 6))
      // custom two-phase heap operator (plans.TopKPerKey): only k rows
      // per (partition, query) reach the shuffle — the 100 TB top-k path
      graft.plans.TopK.perKey(scored, Seq("q_id"),
          Seq("cos" -> graft.plans.TopK.Desc, "c_id" -> graft.plans.TopK.Asc), 5)
        .select(col("q_id"), col("c_id"), col("cos"), col("rk"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, embedding,
          sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS norm
        FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm
            FROM e WHERE vec_id < 10),
      s AS (
        SELECT q_id, e.vec_id AS c_id,
          ROUND(list_sum([CAST(q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
                          for i in generate_series(1, len(q_emb))])
                / (q_norm * e.norm), 6) AS cos
        FROM q, e WHERE e.vec_id <> q_id),
      r AS (SELECT q_id, c_id, cos,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
            FROM s)
      SELECT q_id, c_id, cos, rk FROM r WHERE rk <= 5"""))

  // ---- ann_ivf ----
  private val opIvf = Op(
    "ann_ivf",
    (s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val e = emb(s, dir)
      // centroid per label: element-wise mean, computed distributively
      val cent = e.select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("col")).as("v"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
        .select(col("label").as("cent_label"),
          expr("transform(pv, x -> x.v)").as("cent_emb"))
        .withColumn("cent_norm",
          expr("sqrt(aggregate(cent_emb, 0D, (acc, x) -> acc + x * x))"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("norm").as("q_norm"))
      // probe = nprobe nearest centroids by cosine (k centroids broadcast);
      // nprobe trades candidate volume for recall, the standard IVF knob
      val nprobe = 2
      val probeW = Window.partitionBy(col("q_id"))
        .orderBy(col("cent_cos").desc, col("cent_label"))
      val probed = q.join(broadcast(cent))
        .withColumn("cent_cos", expr(
          "aggregate(zip_with(q_emb, cent_emb, (x, y) -> cast(x AS double) * y), 0D, (acc, x) -> acc + x)")
          / (col("q_norm") * col("cent_norm")))
        .withColumn("prk", row_number().over(probeW))
        .filter(col("prk") <= nprobe)
        .select(col("q_id"), col("q_emb"), col("q_norm"),
          col("cent_label").as("probed_label"))
      // search ONLY the probed bucket
      val c = e.select(col("vec_id").as("c_id"), col("label").as("c_label"),
        col("embedding").as("c_emb"), col("norm").as("c_norm"))
      val scored = c.join(broadcast(probed),
          col("c_label") === col("probed_label") && col("q_id") =!= col("c_id"))
        .withColumn("cos", round(expr("graft_cosine(q_emb, c_emb)"), 6))
      // final ranking via the two-phase TopKPerKey heap operator (k rows
      // per key reach the shuffle), same path ann_cosine_topk uses —
      // a row_number window would re-sort every candidate per query
      graft.plans.TopK.perKey(scored, Seq("q_id"),
          Seq("cos" -> graft.plans.TopK.Desc, "c_id" -> graft.plans.TopK.Asc), 3)
        .select(col("q_id"), col("probed_label").cast("long").as("probed_label"),
          col("c_id"), col("cos"), col("rk"))
    },
    None)

  // ---- dedup_embed: embedding-cosine near-duplicate detection ----
  // IN-BUCKET kernel: pairs are pruned to the same `label` bucket (the
  // IVF partition key ann_ivf uses), so the self-join is an equi-join
  // that never degenerates into a cross product — pair volume is
  // Σ bucket² instead of n². Each unordered pair's cosine is computed
  // once (vec_id < c_id) and mirrored before the per-vector aggregate.
  private[graft] def nearDupCounts(e: DataFrame, threshold: Double): DataFrame = {
    val a = e.select(col("label").as("l"), col("vec_id"),
      col("embedding").as("q_emb"))
    val b = e.select(col("label").as("l"), col("vec_id").as("c_id"),
      col("embedding").as("c_emb"))
    val half = a.join(b, Seq("l")).filter(col("vec_id") < col("c_id"))
      .withColumn("cos", round(expr("graft_cosine(q_emb, c_emb)"), 6))
    val both = half.select(col("vec_id"), col("cos"))
      .union(half.select(col("c_id").as("vec_id"), col("cos")))
    val counts = both.groupBy(col("vec_id"))
      .agg(sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n_near"),
        max(col("cos")).as("max_cos"))
    // singleton buckets have no pairs — report them with n_near=0
    // (max_cos sentinel -1.0) like the sibling dedup ops, instead of
    // silently dropping them from the output
    e.select(col("vec_id"))
      .join(counts, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        coalesce(col("max_cos"), lit(-1.0)).as("max_cos"))
  }

  private val opEmbedDedup = Op(
    "dedup_embed",
    (s, dir) => {
      graft.plans.GraftFunctions.register(s)
      nearDupCounts(Tables(s, dir, "embeddings"), 0.8)
    },
    Some("""
      WITH e AS (
        SELECT vec_id, label, embedding,
          sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS norm
        FROM embeddings),
      p AS (
        SELECT a.vec_id, b.vec_id AS c_id,
          ROUND(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                          for i in generate_series(1, len(a.embedding))])
                / (a.norm * b.norm), 6) AS cos
        FROM e a, e b WHERE a.label = b.label AND a.vec_id < b.vec_id),
      mirrored AS (
        SELECT vec_id, cos FROM p
        UNION ALL SELECT c_id AS vec_id, cos FROM p),
      counts AS (
        SELECT vec_id,
          CAST(SUM(CASE WHEN cos >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
          MAX(cos) AS max_cos
        FROM mirrored GROUP BY vec_id)
      SELECT e.vec_id,
        COALESCE(c.n_near, 0) AS n_near,
        COALESCE(c.max_cos, -1.0) AS max_cos
      FROM e LEFT JOIN counts c ON e.vec_id = c.vec_id"""))

  val ops: Seq[Op] = Seq(opBrute, opIvf, opEmbedDedup)
}
