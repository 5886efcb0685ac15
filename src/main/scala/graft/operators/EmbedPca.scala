package graft.operators

import graft.{Op, Tables}
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** embed_pca — PCA dimensionality reduction as a serving rung of the
  * ANN ladder (the OPQ-family preprocessing move: Jégou/Ge et al.
  * rotate-then-quantize; CCNet/SemDeDup pipelines project before
  * clustering): embeddings are mean-centered and projected onto the
  * top-k principal directions, cutting the per-vector footprint
  * d → k floats ahead of indexing, with the retained variance
  * reported so the operator is honest about what the cut discards.
  *
  * Spark-first decomposition (the same two-halves split as
  * quality_classifier):
  *
  *   - FITTING is one distributed pass: MLlib `RowMatrix`'s
  *     covariance is a Gram-matrix `treeAggregate` (d×d partials
  *     merging map-side — constant size regardless of row count),
  *     followed by a d×d driver-side eigensolve. d is the embedding
  *     width (64 here, ≤ a few thousand in practice) so the driver
  *     work is microseconds; NO row data ever collects.
  *   - PROJECTION is a NARROW per-row expression: the k×d component
  *     matrix and the mean ride the plan as two literals and each
  *     vector folds through them in place — zero shuffle, scan-speed,
  *     composable under any downstream ANN op.
  *
  * Component signs are canonicalized (largest-|entry| coordinate made
  * positive) — eigenvector sign is otherwise arbitrary and would flip
  * run-to-run with last-bit covariance jitter.
  *
  * Not SQL-expressible (eigendecomposition) → rows-only driver check;
  * the spec suite pins orthonormality, variance ordering, planted
  * subspace recovery, and full-rank reconstruction.
  */
object EmbedPca {

  /** Serving projection width: 64 → 16 floats (4× footprint cut — the
    * same budget step as embed_quantize's int8). Real corpora pick k
    * from the explained-variance curve this operator emits. */
  val DefaultK = 16

  /** Fit mean + top-k principal components on `e` (`embedding`
    * array<float>). Two bounded passes (mean, then covariance), each
    * a constant-size treeAggregate; the eigensolve sees only the d×d
    * covariance. Returns (mean, components as k rows of length d,
    * explained-variance ratios, non-increasing). */
  private[graft] def fit(e: DataFrame, k: Int)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    val rows = e.select(col("embedding")).rdd.map(r =>
      OldVectors.dense(r.getSeq[Float](0).map(_.toDouble).toArray))
    rows.cache() // two RowMatrix passes, one materialization
    val mat = new RowMatrix(rows)
    val mean = mat.computeColumnSummaryStatistics().mean.toArray
    val (pc, evr) = mat.computePrincipalComponentsAndExplainedVariance(k)
    rows.unpersist(blocking = false)
    val d = pc.numRows
    val comps = Array.tabulate(k) { j =>
      val v = Array.tabulate(d)(i => pc(i, j))
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(x => -x) else v
    }
    (mean, comps, evr.toArray.take(k))
  }

  /** The narrow projection: y_j = Σ_i (x_i − μ_i)·P_ji, mean and
    * components as plan literals, rounded to 6dp (treeAggregate float
    * order jitters the last bits run-to-run). */
  private[graft] def projectCol(emb: Column, mean: Array[Double],
      comps: Array[Array[Double]]): Column = {
    val mu = typedLit(mean.toSeq)
    val p = typedLit(comps.map(_.toSeq).toSeq)
    transform(sequence(lit(0), lit(comps.length - 1)), j =>
      round(aggregate(sequence(lit(0), lit(mean.length - 1)), lit(0.0),
        (acc, i) => acc +
          (element_at(emb, i + 1) - element_at(mu, i + 1)) *
            element_at(element_at(p, j + 1), i + 1)), 6))
  }

  /** Back-projection x̂ = μ + Pᵀy — the reconstruction the specs use
    * to bound what the cut discards. */
  private[graft] def reconstructCol(proj: Column, mean: Array[Double],
      comps: Array[Array[Double]]): Column = {
    val mu = typedLit(mean.toSeq)
    val p = typedLit(comps.map(_.toSeq).toSeq)
    transform(sequence(lit(0), lit(mean.length - 1)), i =>
      aggregate(sequence(lit(0), lit(comps.length - 1)),
        element_at(mu, i + 1),
        (acc, j) => acc + element_at(proj, j + 1) *
          element_at(element_at(p, j + 1), i + 1)))
  }

  /** Raw projection frame (vec_id, label, pca$k array<double>, evr_k)
    * — the composable shape downstream ANN ops consume; the specs and
    * the recall audit read this form. */
  private[graft] def pcaProjectRaw(s: SparkSession, dir: String,
      k: Int): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val (mean, comps, evr) = fit(e, k)
    e.select(col("vec_id"), col("label"),
        projectCol(col("embedding"), mean, comps).as(s"pca$k"))
      .withColumn("evr_k", round(lit(evr.sum), 4))
  }

  /** The driver query. The projection itself leaves the row as
    * `pca_digest` — md5 of the rounded coordinates' canonical
    * comma-joined string (the mm_embed convention,
    * Multimodal.scala:382): the driver's compare harness hashes
    * scalar columns and chokes on raw arrays. The first two
    * coordinates ride along as scalars so the output still shows
    * real projected values, and `evr_k` reports retained variance. */
  private[graft] def pcaProject(s: SparkSession, dir: String,
      k: Int): DataFrame = {
    val raw = pcaProjectRaw(s, dir, k)
    val p = col(s"pca$k")
    raw.select(
      col("vec_id"), col("label"),
      md5(concat_ws(",", transform(p, x => x.cast("string"))))
        .as("pca_digest"),
      element_at(p, 1).as("pca_c1"),
      element_at(p, 2).as("pca_c2"),
      col("evr_k"))
  }

  private val opPca = Op(
    "embed_pca",
    (s, dir) => pcaProject(s, dir, DefaultK),
    None) // eigendecomposition is not ANSI-SQL-expressible → rows-only

  val ops: Seq[Op] = Seq(opPca)
}
