package graft

import graft.operators.Splits
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("split_safe: exact copies can never straddle the split; ratio lands in the md5 band") {
    // the sf0.001 corpus carries no exact copies, so plant a copy of
    // an existing doc under a far-away id — the guarantee must be
    // exercised, not vacuous
    val corpus = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val copied = corpus.filter(col("doc_id") === 7L)
      .select(lit(990007L).as("doc_id"), col("text"), col("source"))
    val out = Splits.splitSafe(corpus.union(copied)).collect()
    assert(out.nonEmpty)
    // one split value per content hash — the leakage guarantee
    out.groupBy(_.getAs[String]("content_hash")).foreach { case (h, rs) =>
      assert(rs.map(_.getAs[String]("split")).toSet.size == 1,
        s"hash $h straddles the split")
      assert(rs.forall(_.getAs[Long]("n_copies") == rs.length.toLong),
        s"hash $h n_copies vs group size")
    }
    assert(out.exists(_.getAs[Long]("n_copies") > 1L))
    // eval fraction ~ EvalSixteenths/16 of DISTINCT contents (md5
    // uniform); wide band — this is a sanity rail, not a statistics
    // test
    val perHash = out.groupBy(_.getAs[String]("content_hash"))
      .map(_._2.head.getAs[String]("split")).toSeq
    val evalFrac = perHash.count(_ == "eval").toDouble / perHash.size
    assert(evalFrac > 0.03 && evalFrac < 0.30, s"eval fraction $evalFrac")
  }

  test("split_safe: planted copies with far-apart doc ids land together; assignment is content-pure") {
    val d = Seq(
      (1L, "the shared molecule of text one", "web"),
      (900000L, "the shared molecule of text one", "web"), // exact copy
      (2L, "a different molecule entirely two", "web"))
      .toDF("doc_id", "text", "source")
    val out = Splits.splitSafe(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("split"), r.getAs[Long]("n_copies"))).toMap
    assert(out(1L) == out(900000L), "copies must co-assign")
    assert(out(1L)._2 == 2L && out(2L)._2 == 1L)
    // re-running with different ids yields the same split for the
    // same text: the assignment depends on content alone
    val d2 = Seq((77L, "the shared molecule of text one", "web"))
      .toDF("doc_id", "text", "source")
    assert(Splits.splitSafe(d2).head.getAs[String]("split") == out(1L)._1)
  }

  test("split_leakage: near-dup pair shares a cluster, hence a split; sizes fold") {
    graft.plans.GraftFunctions.register(spark)
    // base doc + lightly edited copy (near-dup: shares almost every
    // 3-shingle) + an unrelated doc; filler docs so LSH banding has a
    // corpus to bucket
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val edited = base + " extra"
    val rows = Seq((0L, base, "web"), (1L, edited, "web"),
        (2L, words("unrel", 20), "web")) ++
      (3L to 40L).map(i => (i, words(s"fill${i}x", 20), "web"))
    val out = Splits.splitLeakage(rows.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[String]("split"))).toMap
    assert(out(0L)._1 == out(1L)._1, "near-dups must share a cluster")
    assert(out(0L)._3 == out(1L)._3, "near-dups must share a split")
    assert(out(0L)._2 == 2L && out(1L)._2 == 2L)
    assert(out(2L)._1 != out(0L)._1)
    assert(out.size == rows.size)
    // both splits occur over the corpus (Lehmer hash spreads clusters)
    assert(out.values.map(_._3).toSet == Set("train", "eval"))
  }

  test("split_leakage driver query: every cluster single-split at corpus scale") {
    graft.plans.GraftFunctions.register(spark)
    val out = SparkEntry.queries("split_leakage")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("cluster_id")).foreach { case (c, rs) =>
      assert(rs.map(_.getAs[String]("split")).toSet.size == 1,
        s"cluster $c straddles the split")
      assert(rs.forall(_.getAs[Long]("cluster_size") == rs.length.toLong))
      assert(rs.count(_.getAs[Long]("is_keeper") == 1L) == 1,
        s"cluster $c keeper count")
    }
  }

  test("mix_epoch_plan: weights sum to ~1, epoch cap binds on the smallest source, excess reported") {
    val d = Seq.tabulate(400)(i =>
        // three sources with very different token mass; "tiny" is
        // small enough that its a=1/2 weight over-allocates past the
        // epoch cap
        if (i < 4) (i.toLong, "a b c d e", "tiny")
        else if (i < 200) (i.toLong, (1 to 30).map(j => s"w$j").mkString(" "), "mid")
        else (i.toLong, (1 to 60).map(j => s"v$j").mkString(" "), "big"))
      .toDF("doc_id", "text", "source")
    val out = Splits.epochPlan(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out.size == 3)
    val wsum = out.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum $wsum")
    val tiny = out("tiny")
    assert(tiny.getAs[Double]("epochs") == Splits.MaxEpochs,
      s"tiny source epochs ${tiny.getAs[Double]("epochs")}")
    assert(tiny.getAs[Double]("excess_toks") > 0.0,
      "capped source must report its over-allocation")
    assert(tiny.getAs[Double]("planned_toks") ==
      Splits.MaxEpochs * tiny.getAs[Long]("n_toks"))
    val big = out("big")
    assert(big.getAs[Double]("epochs") < 1.0,
      "the dominant source is down-sampled under a=1/2")
    assert(big.getAs[Double]("excess_toks") == 0.0)
  }

  test("contam_minhash: edited benchmark copy flags fuzzy; unrelated doc stays clean") {
    graft.plans.GraftFunctions.register(spark)
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val bench = "which river is the longest river on the continent of " +
      "africa and through how many countries does it flow today"
    // 0 % 97 == 0 → benchmark slice; 5 is an EDITED copy (one token
    // changed — exact 12-gram matching would still catch this, but a
    // head/tail edit defeats contam_ngram's per-shingle exactness at
    // the flagged positions; minhash bands survive it), 7 unrelated
    val edited = bench.replace("today", "currently")
    val rows = Seq((0L, bench, "web"), (5L, edited, "web"),
        (7L, words("unrel", 20), "web")) ++
      (8L to 50L).map(i => (i, words(s"fill${i}x", 20), "web"))
    val out = Splits.contamMinhash(rows.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hit_bands"), r.getAs[Long]("contaminated"))).toMap
    assert(!out.contains(0L), "benchmark docs are not scored")
    assert(out(5L)._2 == 1L && out(5L)._1 >= 1L,
      s"edited benchmark copy must flag: ${out(5L)}")
    assert(out(7L)._2 == 0L, s"unrelated doc flagged: ${out(7L)}")
    assert(out.values.forall(v => v._1 >= 0L && v._1 <= 8L))
  }

  test("contam_minhash driver query: pool-only rows, band counts in range") {
    graft.plans.GraftFunctions.register(spark)
    val out = SparkEntry.queries("contam_minhash")(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("doc_id") % 97 != 0))
    assert(out.forall { r =>
      val h = r.getAs[Long]("n_hit_bands")
      h >= 0L && h <= r.getAs[Long]("n_bands") &&
        r.getAs[Long]("contaminated") == (if (h >= 1L) 1L else 0L)
    })
    // the corpus carries exact copies across the % 97 boundary often
    // enough that the gate is non-vacuous at fixture scale — if not,
    // the planted spec above still pins the semantics; only assert
    // shape here
  }

  test("mix_upsample: hand-derived repetition counts, both directions, cap binds") {
    import operators.{Sampling, Splits}
    // big source: 40 docs x 6 tokens = 240; small: 3 docs x 6 = 18.
    // sq(240)=15, sq(18)=4, B=258, sqsum=19:
    //   big  e_bp = 15*10^4*258 / (19*240) = 8486  (downsample, e<1)
    //   small e_bp = 4*10^4*258 / (19*18) = 30175  (3 epochs + tranche)
    def text = "tok alpha beta gamma delta eps"
    val d = ((1L to 40L).map(i => (i, text, "big")) ++
      (101L to 103L).map(i => (i, text, "small")))
      .toDF("doc_id", "text", "source")
    val out = Splits.mixUpsample(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Long]("epochs_bp"),
          r.getAs[Long]("n_copies"))).toMap
    assert(out.values.filter(_._1 == "big").map(_._2).toSet == Set(8486L))
    assert(out.values.filter(_._1 == "small").map(_._2).toSet == Set(30175L))
    def inTranche(id: Long, fracBp: Long) =
      (id * Sampling.MixMul % Sampling.MixMod) * 10000 <
        fracBp * Sampling.MixMod
    out.foreach { case (id, (src, bp, copies)) =>
      val expect = bp / 10000 + (if (inTranche(id, bp % 10000)) 1L else 0L)
      assert(copies == expect, s"doc $id: $copies != $expect")
    }
    // downsampling: big source docs repeat 0 or 1 times; the small
    // source floors at 3 with a fractional tranche on top
    assert(out.values.filter(_._1 == "big").map(_._3).toSet
      .subsetOf(Set(0L, 1L)))
    assert(out.values.filter(_._1 == "small").map(_._3)
      .forall(c => c == 3L || c == 4L))
    // the epoch cap binds when one source dwarfs the rest
    val skew = ((1L to 200L).map(i => (i, text * 8, "huge")) ++
      Seq((900L, "a b", "tiny"))).toDF("doc_id", "text", "source")
    val capped = Splits.mixUpsample(skew).collect()
      .filter(_.getAs[String]("source") == "tiny")
    assert(capped.forall(_.getAs[Long]("epochs_bp") ==
      (Splits.MaxEpochs * 10000).toLong), "tiny source must hit the cap")
  }

  test("split_safe: a planted boilerplate digest spreads across partitions through the salted join, result exact") {
    // The twice-carried skew claim (VERDICT r15 #7) made load-bearing
    // — and the original claim turned out FALSE: AQE's
    // OptimizeSkewedJoin only matches joins over bare sorted shuffle
    // stages, and splitSafe's counts side carries its final
    // HashAggregate between the Sort and the shuffle read, so the hot
    // probe partition was never split (verified empirically:
    // `AQEShuffleRead coalesced`, never `skew=true`, at any
    // threshold/factor/force setting). splitSafe now routes through
    // Skew.saltedJoin; this spec pins the MECHANISM at runtime — the
    // planted hot digest's rows land on multiple join output
    // partitions, i.e. no single task ever owns the whole flood — and
    // exactness against the unsalted semantics. Broadcast stays
    // disabled: the 100 TB regime (a billion distinct digests) never
    // broadcasts, and a broadcast join would hide the very shuffle
    // the salt exists to protect.
    val conf = spark.conf
    val savedBc = util.Try(
      conf.get("spark.sql.autoBroadcastJoinThreshold")).toOption
    val savedCo = util.Try(
      conf.get("spark.sql.adaptive.coalescePartitions.enabled")).toOption
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // coalesce off for the MECHANISM assertion only: at spec scale
      // the whole join output is ~3 MB, so AQE correctly merges the
      // salted partitions back into one afterwards — a spec-scale
      // artifact that would mask the spread; at production sizes the
      // salted partitions exceed the advisory size and stay apart
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val hotCopies = 40000L
      val boiler = "please subscribe to our newsletter for more updates"
      val d = spark.range(hotCopies)
        .select(col("id").as("doc_id"), lit(boiler).as("text"),
          md5(col("id").cast("string")).as("source"))
        .union(spark.range(1000)
          .select((col("id") + 1000000L).as("doc_id"),
            concat(lit("unique document number "), col("id")).as("text"),
            lit("web").as("source")))
      val out = Splits.splitSafe(d)
      // mechanism: the hot digest's rows arrive on >= 2 join output
      // partitions — the salt genuinely subdivided the flood (without
      // it, hash(content_hash) pins all 40k rows to ONE reducer)
      val hotPids = out
        .withColumn("pid", spark_partition_id())
        .filter(col("content_hash") === md5(lit(boiler)))
        .select(col("pid")).distinct().count()
      assert(hotPids >= 2L,
        s"hot digest landed on $hotPids partition(s) — salt not engaged")
      // exactness: the hot digest counts every copy once, assignment
      // stays content-pure, nothing is lost or duplicated
      val rows = out.collect()
      assert(rows.length == (hotCopies + 1000).toInt)
      val byHash = rows.groupBy(_.getAs[String]("content_hash"))
      val hotGroup = byHash.maxBy(_._2.length)._2
      assert(hotGroup.length == hotCopies.toInt)
      assert(hotGroup.forall(_.getAs[Long]("n_copies") == hotCopies))
      assert(rows.map(_.getAs[Long]("doc_id")).distinct.length ==
        rows.length)
      byHash.foreach { case (_, rs) =>
        assert(rs.map(_.getAs[String]("split")).toSet.size == 1)
      }
    } finally {
      savedBc.fold(
        conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      savedCo.fold(
        conf.unset("spark.sql.adaptive.coalescePartitions.enabled"))(
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", _))
    }
  }


  test("code_detect routes into the mixing surface: a planted code doc lands in the code domain with its own weight") {
    import operators.{Splits, TextAnalysis, Sampling}
    // the StarCoder practice wired end-to-end (VERDICT r16 #7): the
    // gate's verdict must not terminate in the driver query — routed
    // through TextAnalysis.codeDomain, a code doc leaves its crawl
    // source and every mixer prices "code" as a domain of its own
    val code = "import os\ndef f(x):\n  return g(x) + 1\n" +
      "class A:\n  def h(self):\n    return 2"
    val d = (Seq((1L, code, "web")) ++
      (10L to 14L).map(i => (i, s"plain prose number $i with words", "web")) ++
      (20L to 22L).map(i => (i, s"book text volume $i reads on", "books")))
      .toDF("doc_id", "text", "source")
    val routed = TextAnalysis.codeDomain(d)
    // the router moves ONLY the code doc; shape is unchanged
    assert(routed.columns.toSeq == Seq("doc_id", "text", "source"))
    val bySrc = routed.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    assert(bySrc(1L) == "code", "planted code doc must route to the code domain")
    assert(bySrc.filter(_._1 != 1L).values.toSet == Set("web", "books"))
    // mix_epoch_plan: code is a source row with its own weight
    val plan = Splits.epochPlan(routed).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(plan.contains("code"), "epoch plan must price the code domain")
    assert(plan("code").getAs[Long]("n_docs") == 1L)
    assert(plan("code").getAs[Double]("weight") > 0.0)
    // mix_doremi: code is a reweighted domain (its vocabulary is rare
    // in this corpus, so it must not be down-smoothed to zero)
    val dw = Splits.doremi(routed).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    assert(dw.contains("code") && dw("code") > 0.0)
    assert(math.abs(dw.values.sum - 1.0) < 1e-4)
    // mix_sample: the draw stratifies over the routed domain
    val mixed = Sampling.mixSample(routed).collect()
    assert(mixed.map(_.getAs[String]("source")).toSet.contains("code"))
  }

  test("mix_doremi: scala mirror of the closed form; rare-vocab source upweighted, weights a convex mix") {
    import operators.Splits
    // three sources: "common" re-uses the shared head tokens (low
    // cross-entropy under the corpus unigram LM), "rare" is all
    // singletons (high xent), "mid" in between — sized differently so
    // base_w ≠ uniform
    val d = ((1L to 8L).map(i => (i, "the of and to the of and to", "common")) ++
      (101L to 104L).map(i =>
        (i, (1 to 8).map(j => s"uniq${i}x$j").mkString(" "), "rare")) ++
      (201L to 206L).map(i => (i, "the of and to mid1 mid2 mid3 mid4", "mid")))
      .toDF("doc_id", "text", "source")
    val out = Splits.doremi(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out.size == 3)
    // exact mirror: token counts per (source, token) → global unigram
    // probs → per-source xent → closed-form EG softmax — the same
    // arithmetic the operator runs, derived independently here
    val rows = d.collect().map(r => (r.getString(2), r.getString(1)))
    val st = rows.flatMap { case (s, t) => t.split(" ").map(s -> _) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val g = st.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val n = g.values.sum.toDouble
    val srcs = st.keys.map(_._1).toSet
    val loss = srcs.map { s =>
      val mine = st.filter(_._1._1 == s)
      val nt = mine.values.sum
      s -> (nt, mine.map { case ((_, t), c) =>
        c * -math.log(g(t) / n) }.sum / nt)
    }.toMap
    val ntTot = loss.values.map(_._1).sum.toDouble
    val mean = loss.values.map { case (nt, x) => nt * x }.sum / ntTot
    val raw = loss.map { case (s, (nt, x)) =>
      s -> nt / ntTot * math.exp(Splits.DoremiEta * (x - mean)) }
    val z = raw.values.sum
    loss.foreach { case (s, (nt, x)) =>
      val r = out(s)
      assert(r.getAs[Long]("n_toks") == nt, s"$s n_toks")
      assert(math.abs(r.getAs[Double]("xent") - x) < 1e-5, s"$s xent")
      val w = Splits.DoremiLambda * raw(s) / z +
        (1 - Splits.DoremiLambda) * nt / ntTot
      assert(math.abs(r.getAs[Double]("weight") - w) < 1e-5, s"$s weight")
    }
    // direction: the rare-vocab source must gain vs its token share,
    // the common-head source must lose; weights stay a distribution
    assert(out("rare").getAs[Double]("weight") >
      out("rare").getAs[Double]("base_w"), "rare source must upweight")
    assert(out("common").getAs[Double]("weight") <
      out("common").getAs[Double]("base_w"), "common source must downweight")
    val wsum = out.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum $wsum")
    // driver framing: a distribution over the corpus's sources too
    val corpus = SparkEntry.queries("mix_doremi")(spark, sfDir).collect()
    assert(corpus.length > 1)
    val cw = corpus.map(_.getAs[Double]("weight")).sum
    assert(math.abs(cw - 1.0) < 1e-3, s"corpus weights sum $cw")
  }

  test("mix_upsample driver query: per-source totals equal the exact identity") {
    import operators.Sampling
    val out = SparkEntry.queries("mix_upsample")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("epochs_bp"), r.getAs[Long]("n_copies")))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (src, rows) =>
      val bp = rows.head._3
      val whole = bp / 10000
      val tranche = rows.count(r =>
        (r._1 * Sampling.MixMul % Sampling.MixMod) * 10000 <
          (bp % 10000) * Sampling.MixMod)
      assert(rows.map(_._4).sum == whole * rows.length + tranche, src)
    }
  }

  test("contam_embed: planted copy flags, orthogonal passes, nearest id ties to smaller") {
    // eval slice = ids 0 and 97 (the % 97 convention); pool: an exact
    // copy of eval 0, an orthogonal vector, a paraphrase-near copy of
    // eval 97
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (97L, Seq(0f, 1f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f, 0f)), // copy of eval 0
      (2L, Seq(0f, 0f, 1f, 0f)), // orthogonal to both
      (3L, Seq(0f, 0.9f, 0.1f, 0f))) // semantically near eval 97
    val out = operators.Splits.contamEmbed(
        vecs.toDF("vec_id", "embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("near_eval_id"), r.getAs[Double]("max_cos"),
          r.getAs[Long]("contaminated"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "one row per pool vector")
    assert(out(1L)._1 == 0L && out(1L)._2 >= 0.999 && out(1L)._3 == 1L)
    // both eval cosines are exactly 0 → tie resolves to the smaller id
    assert(out(2L) == (0L, 0.0, 0L))
    assert(out(3L)._1 == 97L && out(3L)._3 == 1L,
      s"near-copy must flag: ${out(3L)}")
  }

  test("contam_embed: corpus scores equal a brute-force mirror of the int8 kernel") {
    def round6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val all = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // mirror the quantization (max-abs / 127, HALF_UP) and the
    // asymmetric float×int8 cosine with the kernel's rounding/tie rule
    val evalQ = all.filter(_._1 % 97 == 0).toSeq.sortBy(_._1).map {
      case (id, x) =>
        val maxabs = x.map(v => math.abs(v.toDouble)).max
        id -> (if (maxabs == 0d) x.map(_ => 0)
        else x.map(v => BigDecimal(v.toDouble / (maxabs / 127.0))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt))
    }
    val expected = all.filter(_._1 % 97 != 0).map { case (id, x) =>
      val nq = math.sqrt(x.map(v => v.toDouble * v.toDouble).sum)
      var bestCos = Double.NegativeInfinity
      var bestId = Long.MaxValue
      evalQ.foreach { case (cid, q) =>
        val dot = x.zip(q).map { case (a, b) => a.toDouble * b }.sum
        val nc = math.sqrt(q.map(v => v.toDouble * v).sum)
        val cos = round6(dot / (nq * nc))
        if (cos > bestCos || (cos == bestCos && cid < bestId)) {
          bestCos = cos; bestId = cid
        }
      }
      id -> (bestId, bestCos,
        if (bestCos >= operators.Splits.ContamEmbTau) 1L else 0L)
    }
    val got = operators.Splits.contamEmbed(e).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("near_eval_id"), r.getAs[Double]("max_cos"),
          r.getAs[Long]("contaminated"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, exp) =>
      assert(got(id) == exp, s"vec $id: got ${got(id)}, expected $exp")
    }
  }

  test("mix_anneal: pool membership at the corpus mean, anneal mass proportional to toks*quality") {
    val d = Seq(("A", "a b c"), ("B", "a a a a a a"))
      .toDF("source", "text")
    val out = graft.operators.Splits.annealPlan(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    // A: 3 toks / 3 distinct -> 1e6 ppm; B: 6 toks / 1 distinct ->
    // 166666; corpus mean 4e6 DIV 9 = 444444 -> only A anneals
    assert(out("A") == (1L, 3L, 1000000L, 1L, 2.7, 0.9))
    assert(out("B") == (1L, 6L, 166666L, 0L, 5.4, 0.0))
  }

  test("mix_anneal corpus invariants: phases tile the budget, anneal only in the pool") {
    val rows = SparkEntry.queries("mix_anneal")(spark, sfDir).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val b = rows.map(_._1).sum.toDouble
    assert(math.abs(rows.map(_._4).sum - 0.9 * b) < 0.01 * rows.length)
    assert(math.abs(rows.map(_._5).sum - 0.1 * b) < 0.01 * rows.length)
    assert(rows.exists(_._3 == 1L)) // the pool is never empty
    rows.foreach { case (_, _, inPool, _, anneal) =>
      assert((anneal > 0.0) == (inPool == 1L))
    }
  }

  test("mix_constrained: greedy boundary lands mid-ladder, dyadic effective mass exact") {
    // quality order A (1e6 ppm) > B (250000) > C (83333); U = 23,
    // budget = 2U = 46. Greedy: A wants 12 (cum 12 ≤ 46 → 4 epochs),
    // B wants 32 (cum 44 ≤ 46 → 4), C is the boundary source:
    // cum 92 > 46, prior 44 < 46 → (46−44) DIV 12 = 0 → the 1-epoch
    // floor (every source trains at least once).
    val d = Seq(
      ("A", "a b c"),
      ("B", "a b a b a b a b"),
      ("C", "a a a a a a a a a a a a")).toDF("source", "text")
    val out = graft.operators.Splits.constrainedPlan(d).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5),
        r.getLong(6), r.getDouble(7), r.getLong(8))).toMap
    // (rnk, epochs, raw_toks, effective_toks, efficiency_ppm)
    assert(out("A") == (1L, 4L, 12L, 45.0 / 8, 468750L))
    assert(out("B") == (2L, 4L, 32L, 15.0, 468750L))
    assert(out("C") == (3L, 1L, 12L, 12.0, 1000000L))
  }

  test("mix_constrained: partial epochs on the boundary source") {
    // one source, budget 2U = 4 toks < desired 4 epochs × 2 = 8:
    // boundary on rank 1 → epochs = 4 DIV 2 = 2; dyadic value of the
    // second epoch is half → effective 1.5U, efficiency 750000 ppm
    val d = Seq(("A", "a b")).toDF("source", "text")
    val row = graft.operators.Splits.constrainedPlan(d).collect().head
    assert(row.getLong(5) == 2L)
    assert(row.getLong(6) == 4L)
    assert(row.getDouble(7) == 3.0)
    assert(row.getLong(8) == 750000L)
  }

  test("mix_constrained corpus invariants: quality-ordered, floor/cap, value never exceeds mass") {
    val rows = SparkEntry.queries("mix_constrained")(spark, sfDir).collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(2),
        r.getLong(6), r.getDouble(7), r.getLong(8)))
      .sortBy(_._2)
    assert(rows.nonEmpty)
    // rank follows quality desc; epochs monotone non-increasing in
    // rank (greedy spends top-quality-first)
    rows.sliding(2).foreach {
      case Array((q1, _, e1, _, _, _, _), (q2, _, e2, _, _, _, _)) =>
        assert(q1 >= q2); assert(e1 >= e2)
      case _ =>
    }
    val b = rows.map(_._4).sum * graft.operators.Splits.BudgetEpochs
    rows.foreach { case (_, _, e, u, raw, eff, effPpm) =>
      assert(e >= 1L && e <= 4L)
      assert(raw == u * e)
      // a repeated epoch is never worth more than a fresh one, and
      // the first epoch is always full value
      assert(eff <= raw.toDouble && eff >= u.toDouble)
      assert((effPpm == 1000000L) == (e == 1L))
    }
    // greedy never over-commits past the budget except through the
    // 1-epoch floor: raw mass beyond max(budget, U) only via floors
    val raw = rows.map(_._5).sum
    val floorMass = rows.filter(_._3 == 1L).map(_._4).sum
    assert(raw <= math.max(b, rows.map(_._4).sum) + floorMass)
  }

  test("longctx_mix: hand buckets — log2 bucketing, linear-in-log upweight, ppm algebra") {
    // two docs of 4 chars (bucket 2) and one of 16 chars (bucket 4);
    // tokens: 1, 1, 4 → tt = 6; weights 2·3=6 and 4·5=20 → wt = 26
    val d = Seq(("a", "aaaa", 4L), ("b", "bbbb", 4L),
      ("c", "cccc cccc cccc c", 16L))
      .toDF("source", "text", "n_chars")
    val out = graft.operators.Splits.longctxMix(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // bucket 2: natural 2e6/6 = 333333, target 6e6/26 = 230769,
    // up = 23076900 DIV 333333 = 69
    assert(out(2L) == (2L, 2L, 333333L, 230769L, 69L))
    // bucket 4: natural 666666, target 20e6/26 = 769230, up = 115
    assert(out(4L) == (1L, 4L, 666666L, 769230L, 115L))
  }

  test("longctx_mix corpus invariants: shares tile, upweight crosses 100 at the weighted-mean band") {
    val rows = SparkEntry.queries("longctx_mix")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).sortBy(_._1)
    assert(rows.nonEmpty)
    // both ppm columns tile to 1e6 within per-row DIV truncation
    assert(math.abs(rows.map(_._3).sum - 1000000L) <= rows.length)
    assert(math.abs(rows.map(_._4).sum - 1000000L) <= rows.length)
    // every row matches the exact rational within truncation slack,
    // so up_x100 rides (b+1)·tt/wt — short bands damp, long amplify
    val tt = rows.map(_._2).sum
    val wt = rows.map(r => r._2 * (r._1 + 1)).sum
    rows.foreach { case (b, toks, nat, tgt, up) =>
      val exact = 100.0 * (b + 1) * tt / wt
      assert(math.abs(up - exact) <= 2.0, s"bucket $b: $up vs $exact")
    }
    assert(rows.head._5 <= 100L && rows.last._5 >= 100L)
  }
}
