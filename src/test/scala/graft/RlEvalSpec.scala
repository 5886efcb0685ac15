package graft

import graft.operators.RlEval
import org.apache.spark.sql.functions._

class RlEvalSpec extends SparkSpec {
  import spark.implicits._

  test("grpo_adv: hand fixture — mean baseline and RLOO, singleton dropped, group mass telescopes to zero") {
    // group 10: scores 10, 20, 30 (n=3, S=60, mean=20)
    // group 11: singleton — dropped (no baseline)
    val scored = Seq(
      (10L, 100L, 10L), (10L, 101L, 20L), (10L, 102L, 30L),
      (11L, 200L, 99L))
      .toDF("prompt_id", "doc_id", "score")
    val out = RlEval.grpoAdv(scored).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(out.length == 3) // singleton gone
    // adv_ppm = ((n*r - S) * 1e6) DIV n
    //   r=10: (30-60)*1e6/3 = -10e6;  r=20: 0;  r=30: +10e6
    assert(out(0) == (100L, 3L, -10000000L,
      // rloo: (10*2 - 50)*1e6 DIV 2 = -15e6
      -15000000L))
    assert(out(1) == (101L, 3L, 0L, 0L))
    assert(out(2) == (102L, 3L, 10000000L, 15000000L))
    // telescoping: sum of per-row (n*r - S) is zero per group, so the
    // UNtruncated advantage mass vanishes — pin via the exact numerator
    val mass = out.map { case (_, n, _, _) => n }.sum // guard shape only
    assert(mass == 9L)
  }

  test("grpo_adv corpus invariants: every group centers (max adv >= 0 >= min adv), rloo sign agrees with mean comparison") {
    val rows = SparkEntry.queries("grpo_adv")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val advs = rs.map(_.getLong(4))
      assert(advs.max >= 0L && advs.min <= 0L)
      rs.foreach { r =>
        // adv and adv_rloo always share a sign (rloo = adv * n/(n-1))
        val (a, rl) = (r.getLong(4), r.getLong(5))
        assert(a == 0L && rl == 0L || a.sign == rl.sign, s"$a vs $rl")
        assert(math.abs(rl) >= math.abs(a)) // leave-one-out amplifies
      }
    }
  }

  test("kto_labels: hand fixture — above-mean bit, class counts, inverse-frequency weights") {
    // group: scores 10, 10, 40 → S=60, n=3; desirable iff 3r > 60
    val scored = Seq((5L, 1L, 10L), (5L, 2L, 10L), (5L, 3L, 40L))
      .toDF("prompt_id", "doc_id", "score")
    val out = RlEval.ktoLabels(scored).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(6),
        r.getLong(7)))
      .sortBy(_._1)
    // n_pos=1, n_neg=2; weights: pos 3e6/(2*1)=1.5e6, neg 3e6/(2*2)=750000
    assert(out(0) == (1L, 0L, 1L, 2L, 750000L))
    assert(out(1) == (2L, 0L, 1L, 2L, 750000L))
    assert(out(2) == (3L, 1L, 1L, 2L, 1500000L))
  }

  test("kto_labels corpus invariants: class counts partition the group, weighted class mass balances") {
    val rows = SparkEntry.queries("kto_labels")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val n = rs.head.getLong(4)
      assert(rs.head.getLong(5) + rs.head.getLong(6) == n)
      assert(rs.length == n)
      // per class, w_ppm * |class| == n*1e6/2 up to DIV truncation * |class|
      val pos = rs.filter(_.getLong(3) == 1L)
      val neg = rs.filter(_.getLong(3) == 0L)
      if (pos.nonEmpty && neg.nonEmpty) {
        val posMass = pos.map(_.getLong(7)).sum
        val negMass = neg.map(_.getLong(7)).sum
        assert(math.abs(posMass - negMass) <= n) // truncation slack
      }
    }
  }

  test("eval_passk: hand fixture — unbiased estimator at k=2, undefined tasks dropped") {
    // task 1: n=4, c=2 → pass@1 = 500000; pass@2 = 1 - C(2,2)/C(4,2)
    //   = 1 - 1/6 → 1e6 - (2*1*1e6) DIV 12 = 833334
    // task 2: n=4, c=0 → pass@2 = 0;  task 3: n=4, c=4 → 1e6
    // task 4: n=1 → dropped (estimator undefined below k)
    val v = Seq(
      (1L, 1L), (1L, 1L), (1L, 0L), (1L, 0L),
      (2L, 0L), (2L, 0L), (2L, 0L), (2L, 0L),
      (3L, 1L), (3L, 1L), (3L, 1L), (3L, 1L),
      (4L, 1L)).toDF("task_id", "correct")
    val out = RlEval.evalPassk(v).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == (1L, 4L, 2L, 500000L, 833334L))
    assert(out(1) == (2L, 4L, 0L, 0L, 0L))
    assert(out(2) == (3L, 4L, 4L, 1000000L, 1000000L))
  }

  test("eval_passk corpus invariants: pass@k >= pass@1, both in [0, 1e6], c <= n, reference sample always passes") {
    val rows = SparkEntry.queries("eval_passk")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, p1, pk) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(c >= 1L && c <= n) // the answer-source sample contains itself
      assert(p1 >= 0L && pk <= 1000000L)
      assert(pk >= p1, s"pass@k $pk < pass@1 $p1") // more draws, more chances
    }
  }

  test("pref_agree: hand fixture — majority, unanimity, per-item Fleiss P_i") {
    // item 1: 5 raters, 3 pos → P_i = (3*2 + 2*1)/(5*4) = 8/20 = 400000
    // item 2: 4 raters, all pos → unanimous, P_i = 1e6
    // item 3: 2 raters split → P_i = 0, majority tie → 1
    // item 4: 1 rater → dropped
    val ratings = Seq(
      (1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 0L), (1L, 4L, 0L),
      (2L, 0L, 1L), (2L, 1L, 1L), (2L, 2L, 1L), (2L, 3L, 1L),
      (3L, 0L, 1L), (3L, 1L, 0L),
      (4L, 0L, 0L)).toDF("item_id", "rater_id", "label")
    val out = RlEval.prefAgree(ratings).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == (1L, 5L, 3L, 1L, 0L, 400000L))
    assert(out(1) == (2L, 4L, 4L, 1L, 1L, 1000000L))
    assert(out(2) == (3L, 2L, 1L, 1L, 0L, 0L))
  }

  test("bt_rating: planted dominance ordering is recovered, ratings normalize to mean scale, refit is deterministic") {
    // round-robin: A beats B 9/10, B beats C 9/10, A beats C 9/10
    val games = (
      Seq.fill(9)((0L, 1L)) ++ Seq.fill(1)((1L, 0L)) ++
      Seq.fill(9)((1L, 2L)) ++ Seq.fill(1)((2L, 1L)) ++
      Seq.fill(9)((0L, 2L)) ++ Seq.fill(1)((2L, 0L)))
      .toDF("winner_m", "loser_m")
    val out = RlEval.btRating(games).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.length == 3)
    val Array(a, b, c) = out.map(_._2)
    assert(a > b && b > c, s"ordering violated: $a $b $c")
    // per-model games: 20 each; wins 18 / 10 / 2
    assert(out.map(_._3).toSeq == Seq(20L, 20L, 20L))
    assert(out.map(_._4).toSeq == Seq(18L, 10L, 2L))
    // normalization: mean rating == BtScale up to DIV truncation
    val mean = out.map(_._2).sum / 3
    assert(math.abs(mean - RlEval.BtScale) <= 3L)
    // BT consistency: recovered win prob a/(a+b) near the planted 0.9
    val pAB = a.toDouble / (a + b)
    assert(pAB > 0.8 && pAB < 0.97, s"p(A beats B) = $pAB")
    // determinism: integer fixed-point refit is bit-identical
    val again = RlEval.btRating(games).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(again.map(_._2).toSeq == out.map(_._2).toSeq)
  }

  test("bt_rating self-games teach nothing and a two-model corpus still fits") {
    val games = (Seq.fill(5)((7L, 7L)) ++ // self-games dropped
      Seq.fill(3)((1L, 2L)) ++ Seq.fill(1)((2L, 1L)))
      .toDF("winner_m", "loser_m")
    val out = RlEval.btRating(games).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // model 7 never appears
    assert(out(0)._2 > out(1)._2)
    assert(out(0)._3 == 4L && out(0)._4 == 3L)
  }

  test("bt_rating corpus run: every model rated, zero-win models rank at the bottom") {
    val rows = SparkEntry.queries("bt_rating")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == RlEval.BtModels)
    rows.foreach { case (_, rating, games, wins) =>
      assert(rating >= 0L && games > 0L && wins >= 0L && wins <= games)
    }
    // more wins against the same opposition should never rank lower
    // across the full ordering — check the extremes
    val byWinRate = rows.sortBy(r => r._4.toDouble / r._3)
    assert(byWinRate.last._2 >= byWinRate.head._2)
  }

  test("eval_mcnemar: hand contingency with continuity correction; degenerate cases pin to zero") {
    import spark.implicits._
    def v(rows: (Long, Long, Long)*) =
      rows.toDF("task_id", "doc_id", "correct")
    // 6 tasks: 1 both-correct, 1 both-wrong, 3 A-only, 1 B-only
    // d = 2, corrected (|2|-1)^2 = 1, chi2 = 1e6 / 4 = 250000
    val out = RlEval.evalMcnemar(v(
      (1L, 10L, 1L), (1L, 11L, 1L),
      (2L, 20L, 0L), (2L, 21L, 0L),
      (3L, 30L, 1L), (3L, 31L, 0L),
      (4L, 40L, 1L), (4L, 41L, 0L),
      (5L, 50L, 1L), (5L, 51L, 0L),
      (6L, 60L, 0L), (6L, 61L, 1L),
      (7L, 70L, 1L))) // single-rollout task: dropped
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4), out.getLong(5), out.getLong(6)) ==
      (6L, 1L, 1L, 3L, 1L, 250000L, 0L))
    // b01 == b10: the correction never overshoots -> exactly 0
    val tied = RlEval.evalMcnemar(v(
      (1L, 1L, 1L), (1L, 2L, 0L), (2L, 1L, 0L), (2L, 2L, 1L)))
      .collect().head
    assert(tied.getLong(5) == 0L)
    // zero discordant pairs: no division, chi2 = 0
    val zero = RlEval.evalMcnemar(v((1L, 1L, 1L), (1L, 2L, 1L)))
      .collect().head
    assert(zero.getLong(5) == 0L && zero.getLong(6) == 0L)
    // a one-sided sweep is significant at the fixed 95% literal
    val sweep = RlEval.evalMcnemar(
      v((1L to 12L).flatMap(t => Seq((t, t * 2, 1L), (t, t * 2 + 1, 0L))): _*)
    ).collect().head
    assert(sweep.getLong(5) == (11L * 11L * 1000000L) / 12L)
    assert(sweep.getLong(6) == 1L)
  }

  test("eval_mcnemar corpus invariants: contingency tiles the task set, one row out") {
    val rows = SparkEntry.queries("eval_mcnemar")(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (n, bc, bw, ao, bo) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(bc + bw + ao + bo == n)
    assert(r.getLong(5) >= 0L)
    assert(r.getLong(6) == 0L || r.getLong(6) == 1L)
  }

  test("eval_bootstrap: Poisson weights replay the Lehmer inverse-CDF; CI bounds land at ranks 5 and 195; mass conserves") {
    // 8 tasks with fixed accuracies; mirror the weight draw in Scala
    // and check one full resample's accuracy against the operator.
    val tasks = (1L to 8L).map(t => (t, t * 100000L))
    val out = RlEval.evalBootstrap(tasks.toDF("task_id", "acc_ppm"))
      .collect()
    assert(out.length == RlEval.BootB,
      s"one row per resample: ${out.length}")
    assert(out.count(_.getAs[Long]("is_ci_lo") == 1L) == 1)
    assert(out.count(_.getAs[Long]("is_ci_hi") == 1L) == 1)
    val rks = out.map(_.getAs[Long]("rk")).sorted
    assert(rks.head == 1L && rks.last == RlEval.BootB &&
      rks.distinct.length == out.length, "rank must be a permutation")
    assert(out.map(_.getAs[Long]("point_ppm")).distinct.length == 1)
    assert(out.head.getAs[Long]("point_ppm") ==
      tasks.map(_._2).sum / tasks.length)
    // mirror resample b = 0
    def w(t: Long, b: Long): Long = {
      val p = (((t * RlEval.BootB + b + 1) * operators.Sampling.MixMul)
        % operators.Sampling.MixMod) * 1000 / operators.Sampling.MixMod
      if (p < 368) 0L else if (p < 736) 1L else if (p < 920) 2L
      else if (p < 981) 3L else 4L
    }
    val ws = tasks.map { case (t, a) => (w(t, 0L), a) }
    val expEff = ws.map(_._1).sum
    val expAcc = ws.map { case (x, a) => x * a }.sum / math.max(expEff, 1L)
    val b0 = out.find(_.getAs[Long]("b") == 0L).get
    assert(b0.getAs[Long]("n_eff") == expEff,
      s"resample-0 effective mass: got ${b0.getAs[Long]("n_eff")}, want $expEff")
    assert(b0.getAs[Long]("boot_ppm") == expAcc)
    // CI bracket: lo value <= point <= hi value (holds for any
    // non-degenerate accuracy spread at B=200)
    val lo = out.find(_.getAs[Long]("is_ci_lo") == 1L).get.getAs[Long]("boot_ppm")
    val hi = out.find(_.getAs[Long]("is_ci_hi") == 1L).get.getAs[Long]("boot_ppm")
    assert(lo <= hi)
  }

  test("eval_wilson: hand intervals exact, degenerate slices stay inside [0, 1e6]") {
    import graft.operators.RlEval
    val verdicts = (
      (1 to 50).map(_ => (0L, 1L)) ++ (1 to 50).map(_ => (0L, 0L)) ++
        (1 to 20).map(_ => (1L, 0L)) ++ (1 to 20).map(_ => (2L, 1L)))
      .toDF("model_id", "correct")
    val out = RlEval.evalWilson(verdicts).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // n=100 x=50: v=25, half = 2000·⌊√26e6⌋ = 10,198,000 →
    // lo = 41,802,000 DIV 104, hi = 62,198,000 DIV 104
    assert(out(0L) == (100L, 50L, 500000L, 401942L, 598057L))
    // x=0: lo clamps to 0, hi = 4e6 DIV 24
    assert(out(1L) == (20L, 0L, 0L, 0L, 166666L))
    // x=n: hi clamps to 1e6
    assert(out(2L) == (20L, 20L, 1000000L, 833333L, 1000000L))
  }

  test("eval_wilson corpus invariants: interval brackets the point, tracks the float Wilson") {
    val rows = SparkEntry.queries("eval_wilson")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == graft.operators.RlEval.BtModels)
    rows.foreach { case (m, n, x, acc, lo, hi) =>
      assert(0L <= lo && lo <= acc && acc <= hi && hi <= 1000000L,
        s"model $m")
      // the integer recipe tracks the exact float Wilson (z=2) within
      // its documented resolution (±2000 ppm half-width + DIV floors)
      val p = x.toDouble / n
      val v = p * (1 - p) * n
      val half = 2 * math.sqrt(v + 1)
      val fLo = math.max((x + 2 - half) * 1e6 / (n + 4), 0)
      val fHi = math.min((x + 2 + half) * 1e6 / (n + 4), 1e6)
      // documented resolution: the ⌊√⌋ floor costs ≤ 2000 ppm on the
      // half-width and the v = x(n−x) DIV n floor costs ≤ one unit of
      // v under the square root — both before the (n+4) division
      val tol = 2000.0 + 2e6 / ((n + 4) * math.sqrt(v + 1))
      assert(math.abs(lo - fLo) <= tol, s"model $m lo $lo vs $fLo")
      assert(math.abs(hi - fHi) <= tol, s"model $m hi $hi vs $fHi")
    }
  }
}
