package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Planted separable corpus: "good" docs draw varied tokens from
    * one vocabulary pool, "junk" docs are short heavy repetitions
    * from a disjoint pool — the classifier must separate them from
    * token evidence alone. Deterministic (fixed seed). */
  private def planted(n: Int): DataFrame = {
    val rnd = new scala.util.Random(4242)
    val goodVocab = (1 to 40).map(i => s"prose$i")
    val junkVocab = (1 to 8).map(i => s"spam$i")
    val rows = (0 until n).map { i =>
      val good = i % 2 == 0
      val text =
        if (good)
          (0 until 30 + rnd.nextInt(30))
            .map(_ => goodVocab(rnd.nextInt(goodVocab.size)))
            .mkString(" ")
        else {
          val w = junkVocab(rnd.nextInt(junkVocab.size))
          ((0 until 4 + rnd.nextInt(8)).map(_ => w) :+
            junkVocab(rnd.nextInt(junkVocab.size))).mkString(" ")
        }
      (i.toLong, text, if (good) 1.0 else 0.0)
    }
    rows.toDF("doc_id", "text", "label")
  }

  private def indexed(d: DataFrame): DataFrame =
    d.withColumn("fidx", QualityClassifier.featureIdx(
      graft.functions.TextFns.tokens(col("text"))))

  /** Rank AUC (probability a random positive outranks a random
    * negative; ties get half credit). */
  private def auc(scored: Seq[(Double, Double)]): Double = {
    val pos = scored.filter(_._2 > 0.5).map(_._1)
    val neg = scored.filter(_._2 <= 0.5).map(_._1)
    val wins = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    wins / (pos.size.toDouble * neg.size)
  }

  test("planted separable corpus: held-out AUC >= 0.95, probs calibrated to the classes") {
    val d = indexed(planted(400)).localCheckpoint()
    val model = QualityClassifier.train(
      d.filter(pmod(col("doc_id"), lit(5)) =!= 0))
    val eval = d.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(QualityClassifier.scoreFromIdx(col("fidx"), model)
        .as("prob"), col("label"))
      .as[(Double, Double)].collect().toSeq
    assert(eval.nonEmpty)
    assert(eval.forall { case (p, _) => p >= 0.0 && p <= 1.0 })
    val a = auc(eval)
    assert(a >= 0.95, s"held-out AUC $a on a separable fixture")
    // calibration direction, not just rank: the classes actually
    // separate in probability space
    val meanPos = eval.filter(_._2 > 0.5).map(_._1).sum /
      eval.count(_._2 > 0.5)
    val meanNeg = eval.filter(_._2 <= 0.5).map(_._1).sum /
      eval.count(_._2 <= 0.5)
    assert(meanPos > 0.8 && meanNeg < 0.2,
      s"mean prob good=$meanPos junk=$meanNeg")
  }

  test("training cap is enforced in code: 10x-cap corpus bounded to <= cap; small corpus untouched") {
    val cap = 5000L
    val big = (0L until 10 * cap).toDF("doc_id")
    val kept = QualityClassifier.boundTraining(big, cap).count()
    assert(kept <= cap, s"boundTraining kept $kept > cap $cap")
    // a real sample, not an empty or degenerate one
    assert(kept >= cap * 4 / 5, s"boundTraining kept only $kept of cap $cap")
    // deterministic: same corpus, same decisions
    assert(QualityClassifier.boundTraining(big, cap).count() === kept)
    // at-or-under-cap corpora pass through whole
    val small = (0L until cap).toDF("doc_id")
    assert(QualityClassifier.boundTraining(small, cap).count() === cap)
  }

  test("model trained on the capped sample still clears the held-out AUC floor") {
    // corpus 10x the cap: training must go through the downsample and
    // the model must still separate the planted classes
    val cap = 40L
    val d = indexed(planted(400)).localCheckpoint()
    val bounded = QualityClassifier.boundTraining(
      d.filter(pmod(col("doc_id"), lit(5)) =!= 0), cap)
    assert(bounded.count() <= cap)
    val model = QualityClassifier.train(bounded)
    val eval = d.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(QualityClassifier.scoreFromIdx(col("fidx"), model)
        .as("prob"), col("label"))
      .as[(Double, Double)].collect().toSeq
    val a = auc(eval)
    assert(a >= 0.9, s"held-out AUC $a after capped training")
  }

  test("native serving fold == Scala recompute from the same indices (hash/fold identity)") {
    val d = indexed(planted(60)).localCheckpoint()
    val model = QualityClassifier.train(d)
    val rows = d.select(col("doc_id"), col("fidx"),
        QualityClassifier.scoreFromIdx(col("fidx"), model).as("prob"))
      .as[(Long, Seq[Int], Double)].collect()
    rows.foreach { case (id, fidx, prob) =>
      val z = model.intercept +
        fidx.map(i => model.weights(i)).sum
      val expected = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(prob - expected) < 1e-9,
        s"doc $id: SQL fold $prob vs recompute $expected")
    }
  }

  test("quality_classifier driver query: schema, both splits, probs in range, preds consistent") {
    val out = SparkEntry.queries("quality_classifier")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    assert(out.head.schema.fieldNames.toSeq ===
      Seq("doc_id", "weak_label", "split", "prob", "pred"))
    val splits = out.map(_.getString(2)).toSet
    assert(splits === Set("train", "eval"))
    out.foreach { r =>
      val prob = r.getDouble(3)
      assert(prob >= 0.0 && prob <= 1.0)
      assert(r.getLong(4) === (if (prob >= 0.5) 1L else 0L))
      assert(r.getLong(1) == 0L || r.getLong(1) == 1L)
    }
  }

  test("sink_classifier: store round-trip scores identically; stale format refused") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-clf").toString
    val d = indexed(planted(80)).localCheckpoint()
    val model = QualityClassifier.train(d)
    graft.sources.ClassifierStore.write(spark, model, dir)
    val back = graft.sources.ClassifierStore.read(spark, dir)
    assert(back.intercept === model.intercept)
    assert(back.weights.toSeq === model.weights.toSeq)
    // the reloaded model serves bit-identically
    val inline = d.select(
      QualityClassifier.scoreFromIdx(col("fidx"), model)).collect()
    val fed = d.select(
      QualityClassifier.scoreFromIdx(col("fidx"), back)).collect()
    assert(inline.map(_.getDouble(0)).toSeq ===
      fed.map(_.getDouble(0)).toSeq)
    // stale marker → loud refusal, not silent garbage scores
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_graft_format"), "99")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._graft_format.crc"))
    val e = intercept[IllegalArgumentException](
      graft.sources.ClassifierStore.read(spark, dir))
    assert(e.getMessage.contains("format version"))
  }
}
