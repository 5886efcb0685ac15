package graft

import graft.operators.{Cluster, Similarity}
import org.apache.spark.sql.functions._

/** embed_cluster / cluster_prune — the prototype-pruning family. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def oneHot(i: Int, s: Float = 1f) =
    Array.tabulate(8)(j => if (j == i) s else 0f)

  /** Unit vector at angle θ in the (e0, e2) plane. */
  private def planar(theta: Double) =
    Array.tabulate(8)(j =>
      if (j == 0) math.cos(theta).toFloat
      else if (j == 2) math.sin(theta).toFloat else 0f)

  test("assign: nearest centroid wins, exact ties go to the smaller id") {
    val cents = Array((0, oneHot(0)), (1, oneHot(1)))
    val e = Seq(
      (1L, planar(0.1)),            // near e0
      (2L, oneHot(1, 2f)),          // exactly e1's direction (scaled)
      (3L, Array.tabulate(8)(j => if (j == 0 || j == 1) 1f else 0f))
    ).toDF("vec_id", "embedding")   // 3: equidistant → tie → cluster 0
    val m = Cluster.assign(e, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    assert(m == Map(1L -> 0L, 2L -> 1L, 3L -> 0L), s"$m")
  }

  test("embed_cluster: planted tight clusters come back coherent") {
    // two well-separated directions, 5 members each with tiny jitter:
    // whatever centroid ids k-means lands on, the output must hold
    // exactly two clusters of 5 whose coherence is near 1
    val e = ((1L to 5L).map(i => (i, planar(0.01 * i))) ++
      (6L to 10L).map(i => (i, Array.tabulate(8)(j =>
        if (j == 1) math.cos(0.01 * i).toFloat
        else if (j == 3) math.sin(0.01 * i).toFloat else 0f))))
      .toDF("vec_id", "embedding")
    val rows = Cluster.embedCluster(e, 2).collect()
    assert(rows.length == 2, s"${rows.length} clusters")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") == 5L, r.toString)
      assert(r.getAs[Double]("mean_ccos") > 0.99, r.toString)
      assert(r.getAs[Double]("min_ccos") <= r.getAs[Double]("mean_ccos") &&
        r.getAs[Double]("mean_ccos") <= r.getAs[Double]("max_ccos"))
    }
  }

  test("embed_cluster: fixture partition — members conserved, stats ordered") {
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val k = Similarity.ivfK(e.count())
    val out = Cluster.embedCluster(e, k).collect()
    assert(out.nonEmpty && out.length <= k)
    assert(out.map(_.getAs[Long]("n_members")).sum == e.count())
    out.foreach(r => assert(
      r.getAs[Double]("min_ccos") <= r.getAs[Double]("max_ccos")))
  }

  test("cluster_prune: exactly the single most prototypical member goes") {
    // one cluster (k=1), six members at increasing-gap angles: budget
    // floor(0.3·6) bins from the easy end = the ONE closest-to-centroid
    // vector (two would be 2/6 · 10 = 20 > 18 tenths). The centroid is
    // the mean direction (~0.41 rad), so θ = 0.45 is the victim.
    val thetas = Seq(0.0, 0.1, 0.25, 0.45, 0.7, 1.0)
    val e = thetas.zipWithIndex
      .map { case (t, i) => (i.toLong, planar(t)) }
      .toDF("vec_id", "embedding")
    val out = Cluster.clusterPrune(e, 1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("keep")).toMap
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 1L,
      3L -> 0L, 4L -> 1L, 5L -> 1L), s"$out")
  }

  test("cluster_prune: budget and easy-side ordering hold per cluster") {
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val out = Cluster.clusterPrune(e, Similarity.ivfK(e.count())).cache()
    try {
      assert(out.count() == e.count(), "row conservation")
      // hard budget: pruned ≤ 3/10 of every cluster, by construction
      val over = out.groupBy(col("cluster"))
        .agg(sum(lit(1L) - col("keep")).as("pruned"),
          count(lit(1)).as("n"))
        .filter(col("pruned") * 10L > col("n") * Cluster.PruneTenths)
      assert(over.isEmpty, over.collect().mkString(", "))
      // pruned members are STRICTLY the easy (high-ccos) side: within
      // each cluster every pruned ccos ≥ every kept ccos (bins are
      // pruned whole, so no interleaving is possible)
      val bad = out.filter(col("keep") === 0L)
        .groupBy(col("cluster")).agg(min(col("ccos")).as("min_pruned"))
        .join(out.filter(col("keep") === 1L)
          .groupBy(col("cluster")).agg(max(col("ccos")).as("max_kept")),
          Seq("cluster"))
        .filter(col("min_pruned") < col("max_kept"))
      assert(bad.isEmpty, bad.collect().mkString(", "))
      assert(out.filter(col("keep") === 0L).count() > 0,
        "spread fixture should prune something")
    } finally out.unpersist()
  }

  test("sink_centroids: round-trip, store-fed prune gate == batch, stale refused") {
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val k = Similarity.ivfK(e.count())
    val cents = Similarity.kmeansCentroids(e, k, Similarity.KmeansIters)
    val thr = Cluster.pruneThresholds(Cluster.assignedWithBin(e, cents))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cents").toString
    graft.sources.CentroidStore.write(spark, cents, thr, dir)
    val backC = graft.sources.CentroidStore.readCentroids(spark, dir)
    assert(backC.length == cents.length)
    backC.zip(cents.sortBy(_._1)).foreach { case ((i1, v1), (i2, v2)) =>
      assert(i1 == i2 && v1.toSeq == v2.toSeq)
    }
    val backT = graft.sources.CentroidStore.readThresholds(spark, dir)
    assert(backT == thr)
    // the store-fed gate (the streaming serving path, run here on the
    // static frame) reproduces the batch keep bits row-for-row
    val gated = graft.streaming.Streams.clusterPruneGated(e, backC, backT)
      .select(col("vec_id"), col("cluster"), col("keep")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Cluster.clusterPrune(e, k).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("keep"))).toMap
    assert(gated == batch)
    // stale marker → loud refusal
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_graft_format"), "99")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._graft_format.crc"))
    val ex = intercept[IllegalArgumentException](
      graft.sources.CentroidStore.readCentroids(spark, dir))
    assert(ex.getMessage.contains("format version"))
  }

  test("cluster_prune: degenerate identical corpus prunes nothing") {
    // every vector in one histogram bin: the whole bin exceeds the
    // budget, so the threshold never fires — pruning an arbitrary 30%
    // of indistinguishable members would be ntile-style tie-splitting,
    // exactly what the bin-atomic rule exists to refuse
    val e = (1L to 50L).map(i => (i, oneHot(0)))
      .toDF("vec_id", "embedding")
    val out = Cluster.clusterPrune(e, 4)
    assert(out.filter(col("keep") === 0L).count() == 0L)
    assert(out.count() == 50L)
  }
}
