package graft

import graft.operators.RankEval

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  test("eval_retrieval: hand fixture — rank metrics at K=5 with graded relevance") {
    // query 1: ranks by (score DESC, doc_id): d1 r0, d2 r2, d3 r0,
    //   d4 r1, d5 r0, d6 r1 (rank 6 — outside K)
    // query 2: nothing relevant; query 3: a single relevant candidate
    val cands = Seq(
      (1L, 1L, 60L, 0L), (1L, 2L, 50L, 2L), (1L, 3L, 40L, 0L),
      (1L, 4L, 30L, 1L), (1L, 5L, 20L, 0L), (1L, 6L, 10L, 1L),
      (2L, 10L, 5L, 0L), (2L, 11L, 4L, 0L),
      (3L, 20L, 9L, 1L))
      .toDF("query_id", "doc_id", "score", "rel")
    val out = RankEval.evalRetrieval(cands).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
      .sortBy(_._1)
    assert(out.length == 3)
    // q1: dcg = 3*w(2) + 1*w(4) = 3*630929 + 430676 = 2323463
    //     idcg = 3*w(1) + 1*w(2) + 1*w(3) = 3000000 + 630929 + 500000
    val (dcg1, idcg1) = (3L * 630929L + 430676L, 3000000L + 630929L + 500000L)
    assert(out(0) == (1L, 6L, 3L, 2L, 1L, 500000L, 400000L,
      dcg1, idcg1, dcg1 * 1000000L / idcg1))
    // q2: no relevant — every metric zero, first_rel_rank sentinel 0
    assert(out(1) == (2L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    // q3: the one candidate is relevant at rank 1 — perfect except
    // precision, which divides by the FIXED K
    assert(out(2) == (3L, 1L, 1L, 1L, 1L, 1000000L, 200000L,
      1000000L, 1000000L, 1000000L))
  }

  test("eval_retrieval corpus invariants: every query has a relevant hit, dcg <= idcg, metrics bounded") {
    val rows = SparkEntry.queries("eval_retrieval")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nCands, nRel, firstRank) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (hit, mrr, prec) = (r.getLong(4), r.getLong(5), r.getLong(6))
      val (dcg, idcg, ndcg) = (r.getLong(7), r.getLong(8), r.getLong(9))
      // the answer-source candidate contains its own token
      assert(nRel >= 1L && nRel <= nCands)
      assert(firstRank >= 1L && firstRank <= nCands)
      assert(dcg >= 0L && dcg <= idcg, s"dcg $dcg > idcg $idcg")
      assert(ndcg >= 0L && ndcg <= 1000000L)
      assert(mrr >= 0L && mrr <= 1000000L)
      assert(prec >= 0L && prec <= 1000000L)
      // hit within K <=> a reciprocal rank exists within K
      assert((hit == 1L) == (mrr > 0L))
      if (hit == 1L) assert(ndcg > 0L)
    }
  }

  test("pref_kappa: perfect panels, worse-than-chance panels, degenerate one-class pool") {
    // perfect agreement across a balanced pool: kappa = +1e6
    val perfect = Seq(
      (1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 1L),
      (2L, 0L, 0L), (2L, 1L, 0L), (2L, 2L, 0L))
      .toDF("item_id", "rater_id", "label")
    val p = RankEval.fleissKappa(perfect).collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == (2L, 6L, 3L))
    assert(p.getLong(3) == 1000000L) // pbar
    assert(p.getLong(5) == 500000L)  // pe at p1 = 0.5
    assert(p.getLong(6) == 1000000L) // kappa

    // systematic disagreement: every pair splits — kappa = -1e6
    val worse = Seq(
      (1L, 0L, 1L), (1L, 1L, 0L),
      (2L, 0L, 0L), (2L, 1L, 1L))
      .toDF("item_id", "rater_id", "label")
    val w = RankEval.fleissKappa(worse).collect().head
    assert(w.getLong(3) == 0L)        // pbar
    assert(w.getLong(6) == -1000000L) // kappa below chance

    // one-class pool: pe = 1e6, kappa 0/0 — reports 0 by convention
    val degen = Seq((1L, 0L, 1L), (1L, 1L, 1L), (2L, 0L, 1L), (2L, 1L, 1L))
      .toDF("item_id", "rater_id", "label")
    val d = RankEval.fleissKappa(degen).collect().head
    assert(d.getLong(5) == 1000000L && d.getLong(6) == 0L)
  }

  test("pref_kappa corpus run: one row, bounds hold, pe consistent with p1") {
    val rows = SparkEntry.queries("pref_kappa")(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (pbar, p1, pe, kappa) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(pbar >= 0L && pbar <= 1000000L)
    assert(p1 >= 0L && p1 <= 1000000L)
    // pe = p1^2 + (1-p1)^2 in ppm, minimized at 500000
    assert(pe >= 499999L && pe <= 1000000L)
    assert(pe == (p1 * p1 + (1000000L - p1) * (1000000L - p1)) / 1000000L)
    assert(kappa >= -1000000L && kappa <= 1000000L)
  }

  test("length_bias: hand fixture — gap buckets, equal-length handling, cap") {
    val pairs = Seq(
      (250L, 30L),   // gap 220 -> bucket 2, longer won
      (30L, 250L),   // gap 220 -> bucket 2, shorter won
      (100L, 100L),  // equal  -> bucket 0, excluded from the rate
      (20L, 10L),    // gap 10 -> bucket 0, longer won
      (1500L, 10L))  // gap 1490 -> capped at bucket 9, longer won
      .toDF("winner_chars", "loser_chars")
    val out = RankEval.lengthBias(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == (0L, 0L, 2L, 1L, 1L, 1000000L))
    assert(out(1) == (2L, 200L, 2L, 1L, 0L, 500000L))
    assert(out(2) == (9L, 900L, 1L, 1L, 0L, 1000000L))
  }

  test("length_bias: an all-equal bucket reports -1, not a div-by-zero") {
    val pairs = Seq((100L, 100L), (7L, 7L)).toDF("winner_chars", "loser_chars")
    val out = RankEval.lengthBias(pairs).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 0L && out.head.getLong(5) == -1L)
  }

  test("length_bias corpus run: bounds hold and the length-correlated scorer is caught favoring length") {
    val rows = SparkEntry.queries("length_bias")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, nPairs, nLonger, nEqual, rate) =>
      assert(bucket >= 0L && bucket < RankEval.GapBuckets)
      assert(nLonger <= nPairs - nEqual)
      assert(rate == -1L || (rate >= 0L && rate <= 1000000L))
    }
    // the deterministic scorer (distinct tokens dominant, n_chars
    // tiebreak) is length-correlated BY CONSTRUCTION — the audit must
    // report the bias: longer wins a majority of unequal pairs overall
    val unequal = rows.map(r => r._2 - r._4).sum
    val longerWins = rows.map(_._3).sum
    assert(unequal > 0L)
    assert(longerWins * 2 > unequal,
      s"audit missed the planted length bias: $longerWins of $unequal")
  }
}
