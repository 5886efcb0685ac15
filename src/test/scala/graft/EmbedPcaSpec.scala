package graft

import graft.operators.EmbedPca
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EmbedPcaSpec extends SparkSpec {
  import spark.implicits._

  /** Planted low-rank corpus: vectors live (almost) in a 2-D subspace
    * of R^16 — signal along two fixed orthogonal directions, tiny iid
    * noise everywhere else. Deterministic (fixed seed). */
  private val dim = 16
  private def planted(n: Int, noise: Double): DataFrame = {
    val rnd = new scala.util.Random(4242)
    val dir1 = Array.tabulate(dim)(i => if (i % 2 == 0) 0.5 else -0.5)
    val dir2 = Array.tabulate(dim)(i => if (i < dim / 2) 0.35 else 0.35)
    val rows = (0 until n).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.5
      val v = Array.tabulate(dim)(j =>
        (a * dir1(j) + b * dir2(j) + rnd.nextGaussian() * noise).toFloat)
      (i.toLong, v.toSeq, i % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("components are orthonormal; explained variance is non-increasing") {
    val (_, comps, evr) = EmbedPca.fit(planted(300, 0.01), 6)
    for (a <- comps.indices; b <- comps.indices) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"P$a · P$b = $dot")
    }
    assert(evr.zip(evr.tail).forall { case (hi, lo) => hi >= lo - 1e-12 },
      s"variance ratios not sorted: ${evr.toSeq}")
    // sign canonicalization: the largest-|entry| coordinate is positive
    comps.foreach { v =>
      assert(v(v.indices.maxBy(i => math.abs(v(i)))) > 0)
    }
  }

  test("planted 2-D subspace: top-2 components carry the variance, k=2 reconstructs") {
    val d = planted(400, 0.005)
    val (mean, comps, evr) = EmbedPca.fit(d, 2)
    assert(evr.sum >= 0.99, s"top-2 explained variance ${evr.sum}")
    // projection + back-projection recovers the signal (relative
    // error bounded by the planted noise floor)
    // corpus-level relative error (per-row ratios blow up on rows
    // whose planted coefficients land near zero — there noise IS the
    // whole vector and no 2-D reconstruction can track it)
    val (num, den) = d.select(
        EmbedPca.reconstructCol(
          EmbedPca.projectCol(col("embedding"), mean, comps),
          mean, comps).as("rec"),
        col("embedding"))
      .as[(Seq[Double], Seq[Float])].collect()
      .map { case (rec, x) =>
        (rec.zip(x).map { case (r, v) => (r - v) * (r - v) }.sum,
          x.map(v => v.toDouble * v).sum)
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val rel = math.sqrt(num / den)
    assert(rel < 0.05, s"corpus relative reconstruction error $rel")
  }

  test("full-rank PCA is a pure rotation: reconstruction is (near-)exact") {
    val d = planted(120, 0.5) // full-rank noise, k = d
    val (mean, comps, _) = EmbedPca.fit(d, dim)
    val err = d.select(
        EmbedPca.reconstructCol(
          EmbedPca.projectCol(col("embedding"), mean, comps),
          mean, comps).as("rec"),
        col("embedding"))
      .as[(Seq[Double], Seq[Float])].collect()
      .map { case (rec, x) =>
        rec.zip(x).map { case (r, v) => math.abs(r - v) }.max }
    // 6dp projection rounding × d accumulations bounds the residue
    assert(err.max < 1e-4, s"full-rank reconstruction residue ${err.max}")
  }

  test("embed_pca driver query: digest schema (no raw arrays), scalar heads finite, evr in (0,1]") {
    val out = SparkEntry.queries("embed_pca")(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.head.schema.fieldNames.toSeq ===
      Seq("vec_id", "label", "pca_digest", "pca_c1", "pca_c2", "evr_k"))
    // every column scalar — the driver's pandas compare hashes columns
    // and crashes on arrays (the r14 red row this contract prevents)
    out.head.schema.foreach(f =>
      assert(!f.dataType.typeName.startsWith("array"), f.name))
    out.foreach { r =>
      assert(r.getString(2).length === 32) // md5 hex
      Seq(r.getDouble(3), r.getDouble(4)).foreach(v =>
        assert(!v.isNaN && !v.isInfinite))
      val evr = r.getDouble(5)
      assert(evr > 0.0 && evr <= 1.0 + 1e-9)
    }
  }

  test("embed_pca digest is the canonical md5 of the raw projection; heads match coords") {
    val k = EmbedPca.DefaultK
    // Spark's own string form of each coordinate (the digest's input),
    // collected separately so the Java-side md5 recompute below checks
    // the concat_ws+md5 pipeline rather than restating it.
    val raw = EmbedPca.pcaProjectRaw(spark, sfDir, k)
      .select(col("vec_id"),
        transform(col(s"pca$k"), x => x.cast("string")).as("strs"),
        col(s"pca$k"), col("evr_k"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getSeq[Double](2), r.getDouble(3)))
      .toMap
    val out = SparkEntry.queries("embed_pca")(spark, sfDir).collect()
    assert(out.length === raw.size)
    out.foreach { r =>
      val (strs, proj, evr) = raw(r.getLong(0))
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(strs.mkString(",").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(r.getString(2) === want, s"digest vec_id=${r.getLong(0)}")
      assert(r.getDouble(3) === proj(0) && r.getDouble(4) === proj(1))
      assert(r.getDouble(5) === evr)
    }
  }
}
