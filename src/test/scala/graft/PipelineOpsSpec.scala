package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val all = TextAnalysis.ops ++ Dedup.ops ++ Similarity.ops ++
    Multimodal.ops ++ operators.Sampling.ops ++ operators.Curate.ops ++
    operators.LangModel.ops ++ operators.Graph.ops ++
    operators.Profile.ops ++ operators.Search.ops

  private def run(name: String) =
    all.find(_.name == name).get.query(spark, sfDir)

  test("every pipeline op executes and returns rows") {
    all.foreach { op =>
      assert(op.query(spark, sfDir).count() > 0, s"${op.name} empty")
    }
  }

  test("dedup_exact: planted duplicates collapse to one keeper") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = Dedup.ops.head.query(spark, sfDir) // smoke on real data
    assert(out.columns.sorted.sameElements(Array("content_hash", "keeper_id", "n_copies")))
    val planted = df.groupBy(md5($"text").as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper_id"))
      .collect().map(r => r.getAs[Long]("n_copies") -> r.getAs[Long]("keeper_id"))
      .sortBy(_._2)
    assert(planted.head == (2L, 1L) && planted.last == (1L, 3L))
  }

  test("dedup_report: depth strata tile the corpus, dropped chars exact on identical copies") {
    val rows = SparkEntry.queries("dedup_report")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val nDocs = Tables(spark, sfDir, "documents").count()
    val nDistinct = Tables(spark, sfDir, "documents")
      .select(md5($"text")).distinct().count()
    assert(rows.map(_._3).sum == nDocs)       // n_docs tiles the corpus
    assert(rows.map(_._2).sum == nDistinct)   // groups tile the hashes
    rows.foreach { case (nc, ng, nd, dropped, chars, droppedChars) =>
      assert(nd == nc * ng && dropped == (nc - 1) * ng)
      // identical copies -> group char mass divisible by depth, so the
      // keeper-only residue is exact
      assert(droppedChars == chars / nc * (nc - 1))
      assert(droppedChars < chars || chars == 0L)
    }
    // planted strata: a flood of 3 copies + a pair + two singletons
    val planted = Dedup.dedupReport(Seq(
      (1L, "aa"), (2L, "aa"), (3L, "aa"),
      (4L, "bbb"), (5L, "bbb"), (6L, "c"), (7L, "dd"))
      .toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(planted(3L) == (1L, 3L, 2L, 6L, 4L))
    assert(planted(2L) == (1L, 2L, 1L, 6L, 3L))
    assert(planted(1L) == (2L, 2L, 0L, 3L, 0L))
  }

  test("dedup_soft: every row kept, weight 1/n_copies, total mass = distinct contents") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (4L, "x y z"), (5L, "p q r"))
      .toDF("doc_id", "text")
    val out = Dedup.softWeights(df).collect()
    assert(out.length == 5, "soft dedup drops nothing")
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_copies"), r.getAs[Double]("weight"),
        r.getAs[Long]("is_canonical"))).toMap
    assert(byId(1L) == ((3L, 0.333333, 1L)))
    assert(byId(2L) == ((3L, 0.333333, 0L)))
    assert(byId(4L) == ((1L, 1.0, 1L)))
    // effective mass: Σ weights == #distinct contents (up to rounding)
    val mass = out.map(_.getAs[Double]("weight")).sum
    assert(math.abs(mass - 3.0) < 1e-4, s"mass $mass")
    // exactly one canonical row per content group
    out.groupBy(_.getString(1)).foreach { case (h, rs) =>
      assert(rs.count(_.getAs[Long]("is_canonical") == 1L) == 1, h)
    }
    // the weighted distribution matches dedup_exact's: each group's
    // total weight is 1 regardless of copy count
    out.groupBy(_.getString(1)).foreach { case (h, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-4, h)
    }
  }

  test("dedup_minhash: identical docs always collide; LSH narrows candidates") {
    // two identical docs + one unrelated → the identical pair must share
    // all 8 bands; the unrelated doc should not match all bands
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSigs(docs).select($"doc_id", $"sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "identical docs must have identical signatures")
    assert(sigs(1L) != sigs(3L), "unrelated docs should differ")
  }

  test("dedup_minhash: exact pre-pass re-expands counts over copy groups") {
    // group A: docs 1,2,3 identical (m=3); group B: docs 4,5 identical
    // (m=2); doc 6 unrelated. In-group candidates = m-1; A and B share
    // no shingles so no cross-group candidates — the collapsed
    // (3-representative) band join must reproduce the per-doc counts
    // the naive all-docs join would give
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "entirely different boilerplate footer text repeated verbatim here"
    val c = "zebra yak xylophone wombat vulture unicorn tiger snake raven quail"
    val fixture = Seq(1L -> a, 2L -> a, 3L -> a, 4L -> b, 5L -> b, 6L -> c)
      .toDF("doc_id", "text")
    val out = Dedup.minhashDedup(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dup_candidates"), r.getAs[String]("sig_digest"))).toMap
    assert(out(1L)._1 == 2L && out(2L)._1 == 2L && out(3L)._1 == 2L)
    assert(out(4L)._1 == 1L && out(5L)._1 == 1L)
    assert(out(6L)._1 == 0L)
    // every copy inherits its representative's signature digest
    assert(out(1L)._2 == out(3L)._2 && out(4L)._2 == out(5L)._2)
    assert(out(1L)._2 != out(6L)._2)
  }

  test("dedup_simhash: near-identical docs land within hamming 8") {
    val docs = Seq(
      (1L, "spark query engine with fast columnar scans and hash joins"),
      (2L, "spark query engine with fast columnar scans and hash joins today"),
      (3L, "zebra yak xylophone wombat vulture unicorn tiger snake raven quail"))
      .toDF("doc_id", "text")
    val sim = Dedup.simhashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sim(1L), sim(2L)) <= 8, "near-dups should be close")
    assert(hamming(sim(1L), sim(3L)) > 8, "unrelated docs should be far")
  }

  test("shingle-set kernel == the explode/collect_set formulation (set equality)") {
    // the narrow kernel replaced a corpus-token-sized exchange; the
    // SETS must be identical (order-free — every consumer is
    // set-semantic) including the <3-token and repeated-shingle edges
    val rnd = new scala.util.Random(5)
    val vocab = "a b c d e".split(" ")
    val docs = ((1 to 120).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    } :+ (900L, "one") :+ (901L, "two words") :+
      (902L, "x y z x y z x y z")) // repeated shingles collapse
      .toDF("doc_id", "text")
    val legacy = Dedup.shingleRows(docs)
      .groupBy($"doc_id").agg(collect_set($"shingle").as("sset"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val kernel = Dedup.shingleSets(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    // legacy emits NO row for zero-token docs; every doc here has >= 1
    assert(kernel.keySet == legacy.keySet, "doc coverage diverged")
    kernel.foreach { case (id, s) =>
      assert(s == legacy(id), s"shingle set mismatch for doc $id")
    }
    // the kernel build must be narrow — no exchange before the sets
    val plan = Dedup.shingleSets(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("normalize kernel == the lower/regex-chain column formulation (fuzz + edges)") {
    // the fused byte-scan kernel must be BIT-identical to the regex
    // chain it replaced — the DuckDB oracle still runs the expanded
    // regex form, so any divergence breaks the scoring family's hashes
    val edges = Seq(
      "", " ", "\t\n\r\f", "a", "an", "the", "a an the",
      "A piece of THE pie, an apple; a_b the_end a1 the9",
      "don't stop-me.now!", "  leading and trailing  ",
      "naïve café — em-dash…unicode ØÆ Aa THE thé",
      "the\tquick\nbrownfox\ffalls\rover", "a.n the.e a,n",
      "[brackets]{braces}(parens)<angles>|pipe\\back`tick~tilde",
      "__underscores__ stay_or_go", "a" * 300, "mixed ANd An aN tHe THe")
    val rnd = new scala.util.Random(11)
    val alphabet =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789" +
        " \t\n.,;:!?'\"-_()[]{}&%$#@~`|\\/^*+=<>éøπ漢字 "
    val fuzz = (1 to 400).map { _ =>
      val len = rnd.nextInt(80)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val rows = (edges ++ fuzz).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
      .select($"id", $"text",
        functions.TextFns.normalize($"text").as("kernel"),
        functions.TextFns.normalizeLegacy($"text").as("legacy"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) == r.getString(3),
        s"normalize mismatch on ${r.getString(1).take(60).mkString}: " +
          s"kernel=[${r.getString(2)}] legacy=[${r.getString(3)}]")
    }
  }

  test("minhash bands kernel == the transform/slice/xxhash64 column formulation") {
    // graft_minhash_bands fuses signature + banding into one kernel
    // eval (the CollapseProject-inlining fix); its values must stay
    // BIT-IDENTICAL to the original column formulation — persisted
    // band stores and every probe path depend on the band space not
    // moving. Random docs incl. sub-shingle-length and empty edges.
    graft.plans.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vocab = "a b c d e f g h i j k l m n o p".split(" ")
    val docs = ((1 to 200).map { i =>
      val n = rnd.nextInt(60) // 0..59 tokens
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    } :+ (900L, "one") :+ (901L, "two words") :+ (902L, ""))
      .toDF("doc_id", "text")
      .withColumn("toks", functions.TextFns.tokens($"text"))
    val both = docs.select($"doc_id",
      expr("graft_minhash_bands(toks)").as("fused"),
      expr("transform(sequence(0, 7), b -> xxhash64(cast(b AS string), " +
        "slice(graft_minhash_sig(toks), b*4 + 1, 4)))").as("legacy"),
      expr("slice(graft_minhash_all(toks), 33, 8)").as("all_bands"),
      expr("slice(graft_minhash_all(toks), 1, 32)").as("all_sig"),
      expr("graft_minhash_sig(toks)").as("legacy_sig"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"band mismatch for doc ${r.getLong(0)}")
      assert(r.getSeq[Long](3) == r.getSeq[Long](2),
        s"minhash_all band mismatch for doc ${r.getLong(0)}")
      assert(r.getSeq[Long](4) == r.getSeq[Long](5),
        s"minhash_all sig mismatch for doc ${r.getLong(0)}")
    }
  }

  test("signature builds are narrow — no shuffle before banding") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    val simPlan = Dedup.simhashOf(docs).queryExecution.executedPlan.toString
    assert(!simPlan.contains("Exchange"), simPlan)
    val mhPlan = Dedup.minhashSigs(docs).queryExecution.executedPlan.toString
    assert(!mhPlan.contains("Exchange"), mhPlan)
  }

  test("dedup_simhash: oversized band buckets sub-split; flood stays bounded") {
    // 1500 synthetic signatures all sharing band 0 (low 16 bits 0xBEEF)
    // with spread upper bits — a boilerplate flood. Plain 16-bit banding
    // would emit C(1500,2) ≈ 1.1M candidate pairs from band 0 alone.
    val flood = (0 until 1500).map { k =>
      (k.toLong, (((k.toLong * 2654435761L) & 0xFFFFFFFFFFFFL) << 16) | 0xBEEFL)
    }
    // planted near-dup pair INSIDE the flood: same bands 0+1, hamming 1
    val sigA = (0xAAAA5555L << 32) | (0x1234L << 16) | 0xBEEFL
    val sim = (flood :+ (9001L, sigA) :+ (9002L, sigA ^ (1L << 63)))
      .toDF("doc_id", "simhash")
    val unsalted = Dedup.simhashPairs(sim, maxBucket = Long.MaxValue).count()
    val salted = Dedup.simhashPairs(sim, maxBucket = 256L)
    val saltedN = salted.count()
    assert(unsalted > 1000000L, s"flood fixture should blow up unsalted: $unsalted")
    assert(saltedN < 20000L,
      s"adaptive salt left $saltedN candidate pairs — mega-bucket not split")
    // the near-dup pair survives the sub-split (shares the salt band too)
    val near = salted.filter($"a" === 9001L && $"b" === 9002L).collect()
    assert(near.length == 1 && near.head.getAs[Number]("hamming").longValue == 1L)
  }

  test("dedup_simhash: bucket sizing is a skinny aggregate, never a window") {
    // bucket populations must come from groupBy(band_id, band_key).count()
    // joined back — a count().over(partitionBy(...)) window buffers an
    // entire band bucket's rows in ONE task, which is exactly the O(n)
    // single-task spill the adaptive salt exists to prevent.
    val sim = Seq((1L, 0xBEEFL), (2L, 0xBEEFL), (3L, 0x1234L))
      .toDF("doc_id", "simhash")
    val plan = Dedup.simhashPairs(sim, maxBucket = 256L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"band-bucket sizing regressed to a partition-buffering window:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"bucket counts should broadcast back onto the bands frame:\n$plan")
  }

  test("dedup_simhash: one-giant-bucket corpus (all docs identical band) stays bounded") {
    // degenerate flood: EVERY doc shares ALL four bands (identical
    // simhash up to 1 low bit) — the worst case for banding. With the
    // salt drawn from the next band's bits, identical signatures still
    // collide, so the guard here is that the pipeline executes the
    // skinny-aggregate sizing path without buffering and the planted
    // far doc contributes no pairs.
    val n = 2000
    val base = 0x5A5A5A5A5A5ABEEFL
    val giant = (0 until n).map(k => (k.toLong, base | ((k & 1).toLong << 62)))
    val sim = (giant :+ (9999L, ~base)).toDF("doc_id", "simhash")
    // with maxBucket >= n nothing splits: C(2000,2) pairs ≈ 2M would
    // flow. With maxBucket=256 the sub-split uses band+1 bits — for
    // identical signatures those collide too (inherent to exact dups;
    // exact-dedup runs first in the pipeline), but the sizing pass
    // itself must complete via the aggregate, not a window.
    val out = Dedup.simhashPairs(sim, maxBucket = 256L)
    val farPairs = out.filter($"a" === 9999L || $"b" === 9999L).count()
    assert(farPairs == 0L, s"far doc must not pair: $farPairs")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "giant-bucket path must not window")
  }

  test("mix_sample: balanced source mixing is deterministic and scale-free") {
    // skewed mixture: 100 docs of src A, 10 of src B → target = 10/source
    val fixture = ((0L until 100L).map(i => (i, "A")) ++
      (100L until 110L).map(i => (i, "B"))).toDF("doc_id", "source")
    val kept = operators.Sampling.mixSample(fixture).collect()
    val bySrc = kept.groupBy(_.getAs[String]("source")).map { case (s, r) => s -> r.length }
    // the smallest source always passes the threshold in full
    assert(bySrc("B") == 10, s"min source must be kept whole: $bySrc")
    // the big source keeps exactly the formula-selected subset
    val expectA = (0L until 100L).count(i =>
      ((i * operators.Sampling.MixMul) % operators.Sampling.MixMod) * 100L <
        operators.Sampling.MixMod * 10L)
    assert(bySrc("A") == expectA && expectA > 0 && expectA < 30,
      s"src A kept ${bySrc("A")}, formula says $expectA")
    // decisions are per-row functions of (doc_id, counts): rerunning on
    // a reordered frame yields the identical id set
    val again = operators.Sampling.mixSample(fixture.orderBy(rand(7)))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == kept.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("sample_temperature: kept mass ∝ sqrt(source size), integer-exact") {
    // 400 docs of src A, 16 of src B: α=1/2 keeps B whole
    // (sqrt(16/16)=1) and A at ~sqrt(16/400)=20 % — between the
    // balanced cap (16) and no cap (400)
    val fixture = ((0L until 400L).map(i => (i, "A")) ++
      (1000L until 1016L).map(i => (i, "B"))).toDF("doc_id", "source")
    val kept = operators.Sampling.sampleTemperature(fixture).collect()
    val bySrc = kept.groupBy(_.getAs[String]("source")).map { case (s, r) => s -> r.length }
    assert(bySrc("B") == 16, s"min source must be kept whole: $bySrc")
    // the keep test is the exact integer formula — replay it driver-side
    val m = operators.Sampling.MixMod
    val expectA = (0L until 400L).count { i =>
      val h = (i * operators.Sampling.TempMul) % m
      h * h * 400L < m * m * 16L
    }
    assert(bySrc("A") == expectA, s"src A kept ${bySrc("A")}, formula says $expectA")
    // ~20 % of A ± sampling noise, strictly between the α=1 and α=0 ends
    assert(expectA > 40 && expectA < 160, s"expected ~80, got $expectA")
    // same broadcast-only plan contract as mix_sample
    val plan = run("sample_temperature").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"sample_temperature must not shuffle the corpus:\n$plan")
  }

  test("contam_ngram / mix_sample plans: broadcast-only joins, corpus never shuffles to join") {
    // contam_ngram: the eval vocabulary is the broadcast side of the
    // flag join; the corpus side must reach it without an exchange
    val contamPlan = run("contam_ngram").queryExecution.executedPlan.toString
    assert(contamPlan.contains("BroadcastHashJoin"), contamPlan)
    assert(!contamPlan.contains("SortMergeJoin") &&
      !contamPlan.contains("ShuffledHashJoin"),
      s"the corpus must not shuffle into the eval join:\n$contamPlan")
    // mix_sample: per-source counts and their min are broadcast tiny
    // aggregates — the corpus scan itself joins without shuffling
    val mixPlan = run("mix_sample").queryExecution.executedPlan.toString
    assert(mixPlan.contains("BroadcastHashJoin"), mixPlan)
    assert(!mixPlan.contains("SortMergeJoin") &&
      !mixPlan.contains("ShuffledHashJoin"),
      s"mix_sample must not shuffle the corpus:\n$mixPlan")
  }

  test("rows-only ops are run-to-run deterministic (driver hashes rows)") {
    // SQL-oracle ops get nondeterminism caught by the DuckDB compare;
    // these have no oracle, so pin determinism here: two runs must
    // produce the identical multiset of rows.
    // the KLL-backed ops are exempt BY CONTRACT: compaction draws the
    // published algorithm's random bits and distributed merge order
    // varies, so their guarantee is the rank-error bound (KllSpec
    // asserts it), not row stability. (At this sf the bins sketch
    // happens to stay below its first compaction and IS stable —
    // that's capacity luck, not a contract.)
    // (outlier_mad_sketch runs TWO KLL levels over 10k events — well
    // past first compaction, so unlike the bins sketch it has no
    // capacity luck; RobustSpec bounds its real contract, the flag
    // agreement with the exact MAD fence.)
    val exempt = Set("score_stats_sketch", "quantile_bins_sketch",
      "outlier_mad_sketch")
    val rowsOnly = graft.SparkEntry.allOps
      .filter(op => op.oracle.isEmpty && !exempt.contains(op.name))
    assert(rowsOnly.nonEmpty)
    rowsOnly.foreach { op =>
      def snapshot() = op.query(spark, sfDir).collect()
        .map(_.toString).sorted.mkString("\n")
      assert(snapshot() == snapshot(), s"${op.name} is nondeterministic")
    }
  }

  test("dedup_span: corpus-frequent spans are cut, rare docs untouched") {
    // 7 docs share an aligned 3-token footer (doc freq 7 > 5 → boiler);
    // one doc is unique. Spans are non-overlapping 3-token windows, so
    // the footer occupies span j=1 of each sharing doc.
    val fixture = ((0 until 7).map(i =>
        (i.toLong, s"u${i}a u${i}b u${i}c bp bq br")) :+
        (99L, "x1 x2 x3")).toDF("doc_id", "text")
    val out = operators.Dedup.spanDedup(fixture).collect()
      .map(r => r.getLong(0) -> r).toMap
    (0 until 7).foreach { i =>
      val r = out(i.toLong)
      assert(r.getAs[Long]("n_spans") == 2L && r.getAs[Long]("n_boiler") == 1L)
      assert(r.getAs[String]("clean_text") == s"u${i}a u${i}b u${i}c",
        s"doc $i: ${r.getAs[String]("clean_text")}")
      assert(r.getAs[Double]("clean_ratio") == 0.5)
    }
    // the unique doc survives byte-identical
    assert(out(99L).getAs[Long]("n_boiler") == 0L &&
      out(99L).getAs[String]("clean_text") == "x1 x2 x3")
    // a small boiler set passes the counted guard → broadcast flag join
    val plan = operators.Dedup.spanDedup(fixture)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      plan)
  }

  test("dedup_span: oversized boiler set is NOT broadcast (counted guard)") {
    // flood fixture: 40 distinct spans each shared by 7 docs (> threshold
    // 5) → 40 boiler rows. With the broadcast bound forced to 0 the flag
    // join must NOT pin the boiler set via an explicit broadcast hint —
    // at web scale that set is GBs and the hint would OOM the driver.
    val flood = (0 until 7).map { d =>
      (d.toLong, (0 until 40).map(s => s"b${s}x b${s}y b${s}z").mkString(" "))
    }.toDF("doc_id", "text")
    val guarded = operators.Dedup.spanDedup(flood, broadcastMaxRows = 0L)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"boiler set above the bound must shuffle-join, not broadcast:\n$plan")
    // the guard changes the join strategy only — results are identical
    def key(r: org.apache.spark.sql.Row) = r.toString
    val a = guarded.collect().map(key).sorted.toSeq
    val b = operators.Dedup.spanDedup(flood).collect().map(key).sorted.toSeq
    assert(a == b, "guarded plan changed results")
  }

  test("ann_ivf: centroid count is capped — training cost is bounded") {
    // k ∝ √n below the cap…
    assert(operators.Similarity.ivfK(500L) ==
      math.ceil(math.sqrt(500.0) * 0.7).toInt)
    // …and flat above it: at 10¹² vectors the driver-side Lloyd cost is
    // O(sample·k·dim·iters) ≤ 65536·4096·64·3 — bounded, not ∝ √n
    assert(operators.Similarity.ivfK(1000L * 1000 * 1000 * 1000) ==
      operators.Similarity.KmeansMaxK)
    assert(operators.Similarity.ivfK(0L) >= 4)
  }

  test("ann_ivf: probe count scales with the cell count (constant probed fraction)") {
    import operators.Similarity.{nprobeFor, ivfK, NProbeMin, ProbeFrac, KmeansMaxK}
    // the shipped formula, pinned: nprobe(k) = max(3, ceil(k/6))
    assert(NProbeMin == 3 && math.abs(ProbeFrac - 1.0 / 6.0) < 1e-12)
    assert(nprobeFor(16) == 3)   // fixture/oracle scale — unchanged plans
    assert(nprobeFor(31) == 6)   // sf0.1
    assert(nprobeFor(98) == 17)  // sf1
    assert(nprobeFor(KmeansMaxK) == 683) // at the centroid cap
    // the scale-safety property itself: probed fraction never falls
    // below ProbeFrac, at any corpus size up to and past the cap —
    // this is what retired the r12 fixed-nprobe recall decay
    Seq(500L, 2000L, 20000L, 1000000L, 100000000L, 10000000000L)
      .foreach { n =>
        val k = ivfK(n)
        assert(nprobeFor(k) >= k * ProbeFrac - 1e-9,
          s"probed fraction decays at n=$n (k=$k, nprobe=${nprobeFor(k)})")
      }
  }

  test("seq_pack: fragments tile fixed-length sequences exactly") {
    // scrambled ids so the Lehmer hash actually reorders the corpus;
    // token counts chosen to cross sequence boundaries and leave a
    // partial tail (total 35 = 4 full 8-token sequences + 3)
    val ids = Seq(900001L, 5L, 123456L, 777L, 424242L, 31L, 650000L, 88L)
    val lens = Seq(3, 5, 8, 2, 6, 1, 7, 3)
    val fixture = ids.zip(lens)
      .map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val L = 8L
    val out = operators.Sampling.seqPack(fixture, L).collect()
    // driver-side reference: same deterministic order, same cuts
    val ordered = ids.zip(lens.map(_.toLong)).sortBy { case (id, _) =>
      ((id * operators.Sampling.MixMul) % operators.Sampling.MixMod, id)
    }
    val total = ordered.map(_._2).sum
    var start = 0L
    val expect = scala.collection.mutable.Set[(Long, Long, Long, Long, Long, Long)]()
    for ((id, n) <- ordered) {
      var s = start / L
      while (s <= (start + n - 1) / L) {
        expect += ((id, s,
          math.max(s * L - start, 0L), math.max(start - s * L, 0L),
          math.min(start + n, (s + 1) * L) - math.max(start, s * L),
          if (s < total / L) 1L else 0L))
        s += 1
      }
      start += n
    }
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expect, s"fragment manifest mismatch:\n got=$got\n exp=$expect")
    // invariants a loader depends on: every full sequence is tiled by
    // exactly L tokens with disjoint offsets; per-doc fragments cover
    // the doc contiguously
    out.filter(_.getLong(5) == 1L).groupBy(_.getLong(1)).foreach { case (seq, fr) =>
      assert(fr.map(_.getLong(4)).sum == L, s"seq $seq not fully tiled")
      val offs = fr.map(r => (r.getLong(3), r.getLong(3) + r.getLong(4))).sortBy(_._1)
      assert(offs.head._1 == 0L &&
        offs.sliding(2).forall { w => w.length < 2 || w(0)._2 == w(1)._1 },
        s"seq $seq offsets not contiguous: ${offs.toSeq}")
    }
    ids.zip(lens).foreach { case (id, n) =>
      assert(out.filter(_.getLong(0) == id).map(_.getLong(4)).sum == n.toLong,
        s"doc $id fragments don't cover its $n tokens")
    }
    // bucketing is an implementation detail of the prefix sum: forcing
    // ~2 docs per bucket (multi-bucket layout, bucket-boundary offsets
    // in play) must produce the identical manifest
    val multiBkt = operators.Sampling.seqPack(fixture, L, targetBucket = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(multiBkt == got, "bucket layout changed the packing")
  }

  test("prefix sums: the only global window runs over the √B superbucket frame") {
    // seq_pack and kv_cache_plan both need a global running sum. The
    // spec pins the recursion depth: exactly ONE window with an empty
    // partitionSpec (single partition) in each plan, and its input must
    // be the superbucket aggregate (√B rows) — never the data rows or
    // the B ∝ n bucket-offset frame the old two-level scheme windowed.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val fixture = (1 to 50).map(i => (i.toLong, ("tok" + i + " ") * (i % 7 + 1)))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
    val plans = Seq(
      "seq_pack" -> operators.Sampling.seqPack(
        fixture.select($"doc_id", $"text"), 8L, targetBucket = 4L),
      "kv_cache_plan" -> operators.MapReduceDocs.kvPlan(fixture, 16L, 40L))
    plans.foreach { case (name, df) =>
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(wins.size == 1,
        s"$name: expected exactly one global window, got ${wins.size}")
      assert(wins.head.child.output.exists(_.name == "_sbsum"),
        s"$name: the global window must read the superbucket sums, not " +
          s"a linearly-growing frame: ${wins.head.child.output.map(_.name)}")
    }
  }

  test("dedup_cluster: min-label components group transitive near-dups") {
    // 5-node chain: convergence needs multiple propagation rounds (the
    // min label walks one hop per round); plus two isolated nodes
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L, 10L).toDF("doc_id")
    val edges = Seq((3L, 4L), (2L, 3L), (1L, 2L), (4L, 5L)).toDF("a", "b")
    val out = Dedup.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      9L -> 9L, 10L -> 10L))
    // op level: every doc lands in exactly one cluster; keepers are the
    // cluster minima; cluster count + non-keepers = doc count
    val op = run("dedup_cluster")
    val n = op.count()
    assert(op.select("doc_id").distinct().count() == n)
    val keepers = op.filter($"is_keeper" === 1)
    assert(keepers.count() == op.select("cluster_id").distinct().count())
    assert(op.filter($"cluster_id" > $"doc_id").count() == 0,
      "cluster id must be the component minimum")
  }

  test("dedup_keep_best: the highest-quality cluster member keeps, not the min id; quality ties fall back to min id") {
    // docs 1..3 chain into one near-dup cluster (consecutive ids
    // sharing a 3-shingle); doc 2 carries the most DISTINCT tokens, so
    // the quality-aware policy must keep 2 — the min-id policy
    // (dedup_cluster) would keep 1, which is exactly the difference
    // this operator exists for. 7 is a singleton; 8,9 are an
    // identical-text pair (equal quality → tie falls to min id 8).
    val shared = "alpha beta gamma"
    val fixture = Seq(
      1L -> s"$shared alpha alpha alpha alpha alpha",   // 3/8 distinct
      2L -> s"$shared delta epsilon zeta eta theta",    // 8/8 distinct
      3L -> s"$shared beta beta gamma gamma beta",      // 3/8 distinct
      7L -> "lorem ipsum dolor sit amet consectetur",
      8L -> "same exact text in both copies here",
      9L -> "same exact text in both copies here")
      .toDF("doc_id", "text")
    val out = operators.Dedup.keepBest(fixture).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L,
      s"1..3 must form one cluster: $out")
    assert(out(2L)._2 == 1L, "the most-diverse member must be keeper")
    assert(out(1L)._2 == 0L && out(3L)._2 == 0L,
      "the min-id member must NOT keep when a better one exists")
    assert(out(7L) == ((7L, 1L)), "singleton keeps itself")
    assert(out(8L)._2 == 1L && out(9L)._2 == 0L,
      "equal quality ties fall back to the min id")
    // every cluster has exactly one keeper
    val byCluster = out.values.groupBy(_._1)
    byCluster.foreach { case (c, ms) =>
      assert(ms.count(_._2 == 1L) == 1, s"cluster $c keeper count") }
  }

  test("dedup_pipeline: LSH candidates → Jaccard verify → transitive clusters") {
    // sliding-window chain: 24-token docs over t0..t31 at shifts
    // 0,2,4,6,8 (docs 1,3,4,5,6; doc 2 = exact copy of 1). Adjacent
    // Jaccard = 20/24 ≈ 0.83 ≥ 0.5 (verified edges, and high enough
    // that each adjacent pair shares ≥1 LSH band w.p. 99.5 %), endpoint
    // Jaccard(1,6) = 14/30 ≈ 0.47 < 0.5 — so {1..6} clustering together
    // PROVES the component step chains verified pairs transitively: the
    // endpoint edge itself cannot survive verification. 8, 9 are
    // unrelated singletons.
    val toks = (0 until 32).map(i => s"t$i")
    def shifted(from: Int) = toks.slice(from, from + 24).mkString(" ")
    val fixture = Seq(
      1L -> shifted(0), 2L -> shifted(0), 3L -> shifted(2), 4L -> shifted(4),
      5L -> shifted(6), 6L -> shifted(8),
      8L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      9L -> "lorem ipsum dolor sit amet consectetur adipiscing elit sed do")
      .toDF("doc_id", "text")
    val out = Dedup.dedupPipeline(fixture).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> (1L, 1L), 2L -> (1L, 0L), 3L -> (1L, 0L), 4L -> (1L, 0L),
      5L -> (1L, 0L), 6L -> (1L, 0L),
      8L -> (8L, 1L), 9L -> (9L, 1L)), s"pipeline clusters wrong: $out")
    // op level on real data: total cover, one keeper per cluster,
    // cluster ids are component minima
    val op = run("dedup_pipeline")
    val n = op.count()
    assert(n == Tables(spark, sfDir, "documents").count() &&
      op.select("doc_id").distinct().count() == n)
    assert(op.filter($"is_keeper" === 1).count() ==
      op.select("cluster_id").distinct().count())
    assert(op.filter($"cluster_id" > $"doc_id").count() == 0)
  }

  test("contam_ngram: eval-set shingle overlap flags contaminated docs") {
    val fixture = Seq(
      (0L, "alpha beta gamma delta"),   // eval doc (0 % 97 == 0)
      (1L, "alpha beta gamma delta"),   // fully contaminated
      (2L, "zeta eta theta iota"),      // clean
      (3L, "alpha beta gamma xyz"),     // 1 of 2 shingles contaminated
      (97L, "other eval text here"))    // eval doc, excluded from output
      .toDF("doc_id", "text")
    val out = Dedup.contamCheck(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_contam"), r.getAs[Double]("contam_ratio"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "eval docs stay out of the output")
    assert(out(1L) == (2L, 1.0))
    assert(out(2L) == (0L, 0.0))
    assert(out(3L) == (1L, 0.5))
  }

  test("ngram_jaccard: identical→1, disjoint→0") {
    val out = run("ngram_jaccard")
    assert(out.filter($"jaccard" < 0 || $"jaccard" > 1).count() == 0)
    assert(out.filter($"n_inter" > $"n_union").count() == 0)
  }

  test("ann_cosine_topk: 5 neighbors per query, descending cosine") {
    val out = run("ann_cosine_topk").collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rows) =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      val cosines = sorted.map(_.getAs[Double]("cos"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("ann_ivf: probes NProbe cells per query; recall >= 0.6 vs brute force") {
    val ivf = run("ann_ivf")
    // the plan must rank through the two-phase heap operator, not a
    // window sort over all candidates (checked first: plan shape holds
    // independently of the recall outcome)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(ivf.select("q_id").distinct().count() == 10)
    // each surviving pair records one (min) probed cell id; the probe
    // budget comes from the scale-safe formula nprobeFor(ivfK(n))
    val npIvf = operators.Similarity.nprobeFor(
      operators.Similarity.ivfK(Tables(spark, sfDir, "embeddings").count()))
    assert(ivf.select("q_id", "bucket").distinct().count() <= 10L * npIvf)
    // real recall bound: of each query's brute-force top-3, k-means IVF
    // with Rep=2 boundary replication and NProbe=3 must recover >= 60%
    // overall. Measured ≈0.83 on the (structure-less, worst-case for
    // IVF) synthetic embeddings at sf0.001/sf0.01 — the recall/cost
    // trade is ~(Rep·NProbe)/k ≈ 37% of the corpus scanned at n=500,
    // a fraction that falls as k grows ∝ √n.
    val brute = run("ann_cosine_topk").filter($"rk" <= 3)
      .select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
    val hits = ivf.select($"q_id", $"c_id").as[(Long, Long)].collect()
      .count(brute.contains)
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall@3 $recall < 0.6 vs brute force")
  }

  test("embed_quantize: int8 roundtrip error bounded by half a scale step") {
    val out = run("embed_quantize").collect()
    assert(out.length > 0)
    out.foreach { r =>
      val (qmin, qmax) = (r.getAs[Long]("q_min"), r.getAs[Long]("q_max"))
      assert(qmin >= -127L && qmax <= 127L, s"int8 range violated: $qmin..$qmax")
      val scale = r.getAs[Double]("scale")
      // per-dim error ≤ scale/2 → mse ≤ scale²/4 (+ rounding slack)
      assert(r.getAs[Double]("mse") <= scale * scale / 4.0 + 1e-9,
        s"mse ${r.getAs[Double]("mse")} vs bound ${scale * scale / 4.0}")
    }
    // the max-abs dimension must hit ±127 exactly (symmetric max-abs scaling)
    assert(out.exists(r => r.getAs[Long]("q_max") == 127L ||
      r.getAs[Long]("q_min") == -127L))
  }

  test("ann_quantized: int8 serving recall >= 0.9 vs the float path") {
    // scale cancellation: cos(q, s·c) = cos(q, c) — the kernel sees raw
    // codes. Hand-check on a known pair first.
    graft.plans.GraftFunctions.register(spark)
    val kernel = Seq((Array(1.0f, 2.0f, 2.0f), Array(10, 20, 20)))
      .toDF("q", "c").selectExpr("graft_cosine_i8(q, c) AS cos")
      .head().getDouble(0)
    assert(math.abs(kernel - 1.0) < 1e-12, s"colinear pair must score 1: $kernel")
    // corrupt (short) codes never rank: NULL, same contract as graft_cosine
    val bad = Seq((Array(1.0f, 2.0f), Array(1)))
      .toDF("q", "c").selectExpr("graft_cosine_i8(q, c) AS cos").head()
    assert(bad.isNullAt(0))
    // serving-path recall: of each query's float-path top-5, the int8
    // path must recover >= 90% overall — int8 rounding is the ONLY
    // difference between the two plans
    val float5 = run("ann_cosine_topk")
      .select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
    val int8 = run("ann_quantized")
    val hits = int8.select($"q_id", $"c_id").as[(Long, Long)].collect()
      .count(float5.contains)
    val recall = hits.toDouble / float5.size
    assert(recall >= 0.9, s"int8 recall@5 $recall < 0.9 vs float path")
    // top-k contract: 5 rows per query, ranks contiguous
    val byQ = int8.collect().groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
  }

  test("ann_ivf_quantized: int8 scoring keeps the IVF result (recall >= 0.9)") {
    // probes are identical to ann_ivf (same centroids, same cells) —
    // the ONLY difference is int8 candidate codes in the final scoring,
    // so the two top-3 sets must agree almost everywhere
    val ivf = run("ann_ivf")
      .select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
    val ivf8 = run("ann_ivf_quantized")
    val hits = ivf8.select($"q_id", $"c_id").as[(Long, Long)].collect()
      .count(ivf.contains)
    val recall = hits.toDouble / ivf.size
    assert(recall >= 0.9, s"int8 IVF recall $recall < 0.9 vs float IVF")
    assert(ivf8.select("q_id").distinct().count() == 10)
    // the serving plan must rank through the heap operator
    assert(ivf8.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("ann_ivf_pq: IVFADC — probed cells only, ADC recall >= 0.5 vs float IVF") {
    // probes are identical to ann_ivf (same centroids, same cells) —
    // the difference is PQ codes + ADC scoring on the candidate side,
    // so the only loss vs float IVF is subspace quantization. On the
    // structureless worst-case embeddings the ann_pq brute-force ADC
    // measures recall@5 ≈ 0.62 vs exact, so 0.5 is the honest bound
    // for the composed path too.
    val ivf = run("ann_ivf")
      .select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
    val ivfadc = run("ann_ivf_pq")
    val hits = ivfadc.select($"q_id", $"c_id").as[(Long, Long)].collect()
      .count(ivf.contains)
    val recall = hits.toDouble / ivf.size
    assert(recall >= 0.5, s"IVFADC recall $recall < 0.5 vs float IVF")
    assert(ivfadc.select("q_id").distinct().count() == 10)
    // candidates are restricted to probed cells: every surviving pair
    // records its (min) probed bucket, and per query at most
    // nprobeFor(ivfK(n)) distinct cells appear — the scan-prune contract
    val npAdc = operators.Similarity.nprobeFor(
      operators.Similarity.ivfK(Tables(spark, sfDir, "embeddings").count()))
    assert(ivfadc.select("q_id", "bucket").distinct().count() <= 10L * npAdc)
    // ranking runs through the two-phase heap operator, and the final
    // scoring side carries PQ codes (c_code), never float embeddings
    val plan = ivfadc.queryExecution.executedPlan
    assert(plan.toString.contains("TopKPerKey"), plan.toString)
    assert(plan.toString.contains("graft_pq_cos"),
      s"candidate scoring must be the ADC kernel:\n$plan")
  }

  test("ann_filtered: predicate prunes BELOW the heap; recall vs exact filtered brute-force") {
    graft.plans.GraftFunctions.register(spark)
    val out = run("ann_filtered")
    // 1) every served result satisfies the metadata predicate — the
    // contract post-filtering cannot give without returning < k rows
    val labels = Tables(spark, sfDir, "embeddings")
      .select($"vec_id".as("c_id"), $"label")
    val offending = out.join(labels, "c_id")
      .filter(!operators.Similarity.FilteredPred).count()
    assert(offending == 0L, s"$offending results violate the predicate")
    assert(out.select("q_id").distinct().count() == 10)
    // 2) recall vs EXACT filtered brute-force (driver-side at this sf):
    // same quantization loss as ann_ivf_pq, so the same honest bound
    val e = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) -2.0 else d / math.sqrt(na * nb)
    }
    val cands = e.filter(_._3 <= 4)
    val exact = e.filter(_._1 < 10).flatMap { case (qid, qe, _) =>
      cands.filter(_._1 != qid)
        .map { case (cid, ce, _) => (qid, cid, cos(qe, ce)) }
        .sortBy { case (_, cid, c) => (-c, cid) }.take(3)
        .map { case (q, c, _) => (q, c) }
    }.toSet
    val got = out.select($"q_id", $"c_id").as[(Long, Long)].collect()
    val recall = got.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.5, s"filtered recall $recall < 0.5 vs exact filtered brute-force")
    // 3) the filter sits BELOW the heap: the final TopKPerKey's own
    // subtree contains the label predicate pushed into a parquet scan —
    // candidates are pruned before ADC scoring, not post-filtered
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("ann_filtered").queryExecution.executedPlan
      val heap = plan.collect {
        case p if p.nodeName.contains("TopKPerKey") => p
      }
      assert(heap.nonEmpty, s"no heap operator in:\n$plan")
      val sub = heap.head.toString
      assert(sub.contains("LessThanOrEqual(label,4)"),
        s"predicate must be pushed into the candidate scan below the heap:\n$sub")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dedup_embed kernel: planted near-identical vectors are detected") {
    graft.plans.GraftFunctions.register(spark)
    val v = Array.tabulate(64)(i => (i + 1).toFloat)
    val vNear = v.clone(); vNear(0) = v(0) * 1.01f // same direction, ~1.0 cos
    val vFar = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val e = Seq((1L, 0, v), (2L, 0, vNear), (3L, 0, vFar), (4L, 1, v))
      .toDF("vec_id", "label", "embedding")
    val out = operators.Similarity.nearDupCounts(e, 0.95, bits = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // LSH buckets by DIRECTION, not label: vec 4 duplicates vec 1's
    // direction from another label and is still found (the old fixed
    // label buckets could never see that pair)
    assert(out(1L)._1 == 2L, "vec 1 sees both same-direction near-dups")
    assert(out(2L)._1 == 2L)
    assert(out(4L)._1 == 2L)
    assert(out(3L)._1 == 0L, "orthogonal-ish vector is not a near-dup")
    assert(out(1L)._2 > 0.999, "planted pair cosine ~1")
  }

  test("dedup_embed LSH: pair volume scales linearly, not quadratically") {
    graft.plans.GraftFunctions.register(spark)
    // all vectors share ONE label (the old per-label scheme would
    // compare every pair: 4x the pairs when n doubles). Band width
    // grows with n (embBits), so bucket population — and pairs per
    // vector — stay roughly constant: doubling n should ~double pairs.
    def fixture(n: Int) = (0 until n).map { k =>
      (k.toLong, 0,
        Array.tabulate(64)(i => (((k * 131 + i * 17 + k * i * 7) % 101) - 50).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val p120 = operators.Similarity.lshCandidatePairs(
      fixture(120), operators.Similarity.embBits(120)).count()
    val p240 = operators.Similarity.lshCandidatePairs(
      fixture(240), operators.Similarity.embBits(240)).count()
    assert(operators.Similarity.embBits(120) == 3 &&
      operators.Similarity.embBits(240) == 4)
    assert(p120 > 0 && p240 > 0, "banding should still produce candidates")
    assert(p240 < 2.8 * p120,
      s"pairs grew $p120 -> $p240 on 2x data — quadratic, buckets not scaling")
    // identical planted pair always collides (theta = 0)
    val dup = fixture(120).union(Seq((999L, 0,
      Array.tabulate(64)(i => (((7 * 131 + i * 17 + 7 * i * 7) % 101) - 50).toFloat)))
      .toDF("vec_id", "label", "embedding"))
    val cand = operators.Similarity.lshCandidatePairs(dup, 3)
      .filter(col("va") === 7L && col("vb") === 999L).count()
    assert(cand == 1L, "identical-direction pair must be a candidate")
  }

  test("mm_pack: atoms pack whole by sequence cost, packs tile contiguously, totals conserved") {
    import spark.implicits._
    // costs 1000, 1500, 900, 100: doc 2 starts at 1000 (pack 0,
    // absorbed overflow), doc 3 starts at 2500 -> pack 1, doc 4 at
    // 3400 -> pack 1
    val costs = Seq((1L, 1000L), (2L, 1500L), (3L, 900L), (4L, 100L))
      .toDF("doc_id", "doc_cost")
    val out = operators.Multimodal.mmPack(costs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 1000L, 0L, 0L)))
    assert(out(1) == ((2L, 1500L, 0L, 1000L)))
    assert(out(2) == ((3L, 900L, 1L, 0L)))
    assert(out(3) == ((4L, 100L, 1L, 900L)))
  }

  test("mm_pack corpus invariants: every doc placed once, packs tile from 0 with no overlap, costs match interleave") {
    val rows = SparkEntry.queries("mm_pack")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val inter = SparkEntry.queries("mm_interleave")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(8)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sum }
    assert(rows.length == inter.size, "one placement per document")
    rows.foreach { case (d, cost, _, _) => assert(cost == inter(d)) }
    rows.groupBy(_._3).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_._4)
      assert(inOrder.head._4 == 0L)
      inOrder.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._2,
          s"pack must tile contiguously: ${a._1} -> ${b._1}")
        case _ =>
      }
    }
  }

  test("mm_interleave: hand fixture — rendered string reconstructed, patch budget from the planted grid") {
    import spark.implicits._
    // 20 tokens, stride 8 -> 3 slots (8, 8, 4 tokens)
    val toks = (1 to 20).map(i => s"t$i")
    val docs = Seq((5L, toks.mkString(" "))).toDF("doc_id", "text")
    val out = Multimodal.mmInterleave(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .sortBy(_._1)
    assert(out.length == 3)
    // rebuild the rendered string and check every span cuts its chunk
    val chunks = toks.grouped(8).map(_.mkString(" ")).toSeq
    val rendered = chunks.map("<|img|>" + _).mkString
    out.zip(chunks).foreach { case ((slot, img, patches, ctoks, pos,
        cs, ce, cost), chunk) =>
      assert(img == 5000L + slot)
      assert(rendered.substring(pos.toInt, pos.toInt + 7) == "<|img|>")
      assert(rendered.substring(cs.toInt, ce.toInt) == chunk)
      // planted grid: patches = ceil(w/14)*ceil(h/14)
      val (w, h) = if (img % 3 == 0) (img % 64 + 1, img % 48 + 1)
        else (img % 96 + 1, img % 72 + 1)
      assert(patches == ((w + 13) / 14) * ((h + 13) / 14))
      assert(cost == patches + ctoks)
    }
    assert(out.map(_._4).toSeq == Seq(8L, 8L, 4L), "chunk token extents")
  }

  test("mm_interleave corpus invariants: slots contiguous from 0, positions strictly increase, every budget positive") {
    val rows = SparkEntry.queries("mm_interleave")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5),
        r.getLong(8)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_._2)
      assert(inOrder.head._2 == 0L && inOrder.head._4 == 0L)
      assert(inOrder.map(_._2).toSeq == (0L until rs.length.toLong))
      inOrder.sliding(2).foreach {
        case Array(a, b) => assert(b._4 > a._4)
        case _ =>
      }
      rs.foreach { t => assert(t._3 > 0L && t._5 > 0L) }
    }
  }

  test("mm_meta kernel: hand-computed PNG/JPEG/WAV headers parse exactly") {
    graft.plans.GraftFunctions.register(spark)
    // hand-written PNG: signature + IHDR(len 13) with width 300
    // (0x0000012C), height 7, depth 8, color type 6 (RGBA → 4 channels)
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x01, 0x2c, 0, 0, 0, 7, 8, 6, 0, 0, 0).map(_.toByte)
    // hand-written JPEG: SOI, a COM segment (len 4, 2 payload bytes —
    // the parser must SKIP it by its length), SOF2 (progressive, 0xc2)
    // precision 12, height 0x0102=258, width 0x0304=772, 1 component
    val jpg = Array[Int](
      0xff, 0xd8, 0xff, 0xfe, 0, 4, 'h', 'i',
      0xff, 0xc2, 0, 11, 12, 0x01, 0x02, 0x03, 0x04, 1, 1, 0x11, 0).map(_.toByte)
    // hand-written WAV: RIFF/WAVE with a junk chunk BEFORE fmt (the
    // parser must walk chunks, odd size pads to even), then fmt :
    // PCM, 2 channels, rate 44100 (0xAC44 LE), bits 24
    val wav = ("RIFF".getBytes("US-ASCII") :+ 0x2a.toByte :+ 0.toByte :+
      0.toByte :+ 0.toByte) ++ "WAVE".getBytes("US-ASCII") ++
      ("junk".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 9, 9, 9, 0)) ++
      "fmt ".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0,
        1, 0, 2, 0, 0x44.toByte, 0xac.toByte, 0, 0,
        0x98.toByte, 0x09.toByte, 0x04, 0, 6, 0, 24, 0)
    val rows = Seq((1L, png), (2L, jpg), (3L, wav), (4L, "nope".getBytes))
      .toDF("id", "p").selectExpr("id", "graft_media_meta(p) AS m")
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    assert(rows(1L) == Seq(1L, 300L, 7L, 4L, 0L, 8L), s"png: ${rows(1L)}")
    assert(rows(2L) == Seq(2L, 772L, 258L, 1L, 0L, 12L), s"jpeg: ${rows(2L)}")
    assert(rows(3L) == Seq(3L, 0L, 0L, 2L, 44100L, 24L), s"wav: ${rows(3L)}")
    assert(rows(4L) == Seq(0L, 0L, 0L, 0L, 0L, 0L), s"unknown: ${rows(4L)}")
  }

  test("mm_meta builders: the synthetic containers are REAL files (JDK-decodable)") {
    // the PNG builder's output must survive a full javax.imageio decode
    // (CRCs and the zlib IDAT stream are real, not just the header)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(operators.Multimodal.buildPng(33, 17)))
    assert(img != null && img.getWidth == 33 && img.getHeight == 17)
    // the WAV builder's output must parse via javax.sound.sampled
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(
        operators.Multimodal.buildWav(2, 22050, 16, Array[Byte](1, 2, 3, 4))))
      .getFormat
    assert(fmt.getChannels == 2 && fmt.getSampleRate == 22050f &&
      fmt.getSampleSizeInBits == 16)
    // the JPEG skeleton: javax.imageio header read (no entropy decode)
    // reports the SOF dimensions
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(operators.Multimodal.buildJpeg(99, 41, 3)))
    val readers = javax.imageio.ImageIO.getImageReaders(in)
    assert(readers.hasNext, "JDK JPEG reader did not recognize the skeleton")
    val rd = readers.next()
    rd.setInput(in)
    assert(rd.getWidth(0) == 99 && rd.getHeight(0) == 41)
    rd.dispose()
  }

  test("mm_meta: parsed metadata matches the planted per-doc parameters") {
    val out = run("mm_meta").collect()
    assert(out.length > 0)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      operators.Multimodal.plantedFormat(id) match {
        case 0 =>
          assert(r.getAs[String]("format") == "png")
          assert(r.getAs[Long]("width") == operators.Multimodal.plantedW(id))
          assert(r.getAs[Long]("height") == operators.Multimodal.plantedH(id))
          assert(r.getAs[Long]("channels") == 3L && r.getAs[Long]("bits") == 8L)
        case 1 =>
          assert(r.getAs[String]("format") == "jpeg")
          assert(r.getAs[Long]("width") == operators.Multimodal.plantedW(id))
          assert(r.getAs[Long]("height") == operators.Multimodal.plantedH(id))
          assert(r.getAs[Long]("channels") == 3L && r.getAs[Long]("bits") == 8L)
        case _ =>
          assert(r.getAs[String]("format") == "wav")
          assert(r.getAs[Long]("channels") ==
            operators.Multimodal.plantedChannels(id))
          assert(r.getAs[Long]("sample_rate") ==
            operators.Multimodal.plantedRate(id))
          assert(r.getAs[Long]("bits") == 16L)
      }
    }
    // batch_size is layout-dependent, so it stays OUT of the op output
    // (rows-only determinism must hold under repartitioning)…
    assert(!out.head.schema.fieldNames.contains("batch_size"))
    // …but the batch machinery is still audited here, on a forced
    // single-partition layout: 150 rows → batches of 64, 64, 22
    val fixture = (1 to 150).map(i =>
      Multimodal.MMIn(i.toLong, s"payload-$i".getBytes)).toDS().repartition(1)
    val sizes = operators.Multimodal.ingest(fixture).collect()
      .map(_.batch_size).groupBy(identity).view.mapValues(_.length).toMap
    assert(sizes == Map(64L -> 128, 22L -> 22), s"batch layout wrong: $sizes")
  }

  test("mm_video_dedup: planted re-upload found via sampled frames; edited outro invisible") {
    import operators.Multimodal
    // ids 98..104: 101 ≡ 3 (mod 7) → a re-upload of clip 100 whose
    // LAST frame is edited; ids large enough that frames are real
    // images (tiny 1×1 clips have degenerate all-equal dHashes)
    val docs = (98L to 104L).map(i => Multimodal.MMIn(i, Array[Byte]()))
      .toDS()
    val fh = Multimodal.sampleFrames(
      Multimodal.clipsWithCopies(docs).toDF())
    val out = Multimodal.videoNearDup(fh).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sampled"), r.getAs[Long]("n_near_clips"))).toMap
    assert(out.keySet == (98L to 104L).toSet)
    // stride 3 over 6 frames → frames {0, 3} sampled; the edited
    // frame 5 never decodes, so the copy matches on ALL sampled frames
    assert(out.values.forall(_._1 == 2L), s"$out")
    assert(out(100L)._2 == 1L && out(101L)._2 == 1L,
      s"planted pair missed: $out")
    ((98L to 104L).toSet - 100L - 101L).foreach(i =>
      assert(out(i)._2 == 0L, s"false positive on $i: ${out(i)}"))
    // the copy's sampled frame hashes are HASH-IDENTICAL to the
    // canonical clip's (same planted pixels, same dims)
    val hashes = fh.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")) ->
        r.getAs[Long]("frame_hash")).toMap
    assert(hashes((100L, 0L)) == hashes((101L, 0L)))
    assert(hashes((100L, 3L)) == hashes((101L, 3L)))
  }

  test("mm_scenes: cuts land exactly at the planted scene boundaries") {
    import operators.Multimodal
    // scene-structured clips: 6 frames, scenes of SceneLen=2 identical
    // frames → cuts before frames 2 and 4, 3 scenes; ids large enough
    // for non-degenerate images (1×1 frames hash alike regardless)
    val docs = (98L to 104L).map(i => Multimodal.MMIn(i, Array[Byte]()))
      .toDS()
    val out = Multimodal.sceneCuts(
        Multimodal.clipsScened(docs).toDF())
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_scenes"),
          r.getAs[String]("cut_idxs"), r.getAs[Long]("max_step"),
          r.getAs[Long]("min_step"))).toMap
    assert(out.keySet == (98L to 104L).toSet)
    out.foreach { case (id, (nf, ns, cuts, maxS, minS)) =>
      assert(nf == Multimodal.ClipFrames.toLong, s"clip $id")
      assert(ns == 3L, s"clip $id: $ns scenes, cuts '$cuts'")
      assert(cuts == "2,4", s"clip $id cuts at '$cuts'")
      // identical frames within a scene → zero step; cross-scene steps
      // clear the threshold with margin
      assert(minS == 0L && maxS > Multimodal.SceneCutTau, s"clip $id")
    }
  }

  test("mm_scenes: hand-built [A,A,B] clip cuts once; single-frame clip is one scene") {
    import operators.Multimodal
    val a = Multimodal.buildPng(32, 24, Multimodal.plantedLuma(7001L, _, _))
    val b = Multimodal.buildPng(32, 24, Multimodal.plantedLuma(7002L, _, _))
    val clips = Seq(
      Multimodal.MMClip(1L, Seq(a, a, b)),
      Multimodal.MMClip(2L, Seq(a))).toDS().toDF()
    val out = Multimodal.sceneCuts(clips).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_scenes"), r.getAs[String]("cut_idxs"))).toMap
    assert(out(1L) == (2L, "2"), s"${out(1L)}")
    assert(out(2L) == (1L, ""), s"${out(2L)}")
  }

  test("mm_scenes driver query: detector is narrow — no hash/range shuffle") {
    val df = SparkEntry.queries("mm_scenes")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the synthesis stand-in's
    // round-robin rebalance (input plumbing); the detector itself must
    // add no repartitioning of any kind
    assert(!plan.contains("hashpartitioning") &&
        !plan.contains("rangepartitioning"),
      s"scene detection must be per-row narrow, got:\n$plan")
    // the frame hashes are let-bound once per row, not re-derived per
    // consumer: exactly one dHash call site in the whole plan
    assert("graft_dhash".r.findAllIn(plan).size == 1, plan)
    val rows = df.collect()
    assert(rows.length == Tables(spark, sfDir, "documents").count())
  }

  test("mm_embed: unit-norm encoder output is layout-independent") {
    val out = run("mm_embed").collect()
    assert(out.length > 0)
    out.foreach { r =>
      assert(r.getAs[Long]("dim") == 64L)
      assert(r.getAs[Double]("norm") == 1.0)
    }
    assert(!out.head.schema.fieldNames.contains("batch_size"))
    // payload-pure and batch-independent: a DIFFERENT partition layout
    // (different last-batch remainders) yields identical digests
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[operators.Multimodal.MMIn]
    val a = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("emb_digest")).toMap
    operators.Multimodal.encode(docs.repartition(7)).toDF()
      .select(col("doc_id"),
        md5(concat_ws(",", expr("transform(embedding, x -> cast(x AS string))")))
          .as("emb_digest"))
      .collect().foreach { r =>
        assert(a(r.getAs[Long]("doc_id")) == r.getAs[String]("emb_digest"))
      }
  }

  test("lang_id: argmax picks the stopword-dominant language; ties fall to en") {
    val fixture = Seq(
      (1L, "der hund und die katze ist hier"), // German stopwords dominate
      (2L, "le chat et la maison des gens"),   // French
      (3L, "the cat of the house and dog"),    // English
      (4L, "nothing matching any stopword list here"), // all-zero tie → en
      (5L, "el gato y los perros las casas")   // Spanish
    ).toDF("doc_id", "text")
    val out = operators.TextAnalysis.predictLang(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang"))
      .toMap
    assert(out == Map(1L -> "de", 2L -> "fr", 3L -> "en", 4L -> "en", 5L -> "es"))
  }

  test("text_repetition: dup-line and top-bigram signals on planted fixtures") {
    val fixture = Seq(
      (1L, "spam spam spam spam"),          // top bigram "spam spam" = 3/3
      (2L, "all words here are different"), // every bigram unique: 1/4
      (3L, "line\nline\nother"),            // 1 dup line of 3
      (4L, "one"),                           // no bigrams at all
      (5L, null))                            // NULL text: stats 0, not null
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis.repetitionSignals(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_line_ratio"), r.getAs[Long]("n_bigrams"),
          r.getAs[Double]("top_bigram_ratio"))).toMap
    assert(out(1L) == (0.0, 3L, 1.0))
    assert(out(2L) == (0.0, 4L, 0.25))
    assert(out(3L)._1 > 0.33 && out(3L)._1 < 0.34)
    assert(out(4L) == (0.0, 0L, 0.0))
    // the bigram stats coalesce like the oracle's LEFT JOIN did: a
    // NULL text must yield (0, 0.0), never null-propagate
    assert(out(5L)._2 == 0L && out(5L)._3 == 0.0)
  }

  test("pii_scrub: emails and phones are redacted and counted") {
    val fixture = Seq(
      (1L, "reach me at jane.doe+x@corp.example.org or 555-123-4567 ok"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c@d.io and 111-222-3333 444-555-6666"))
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis.piiScrub(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[String]("scrubbed"))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L)
    assert(out(1L)._3 == "reach me at [EMAIL] or [PHONE] ok")
    assert(out(2L) == (0L, 0L, "no pii here at all"))
    assert(out(3L)._1 == 2L && out(3L)._2 == 2L)
    assert(!out(3L)._3.contains("@") && !out(3L)._3.contains("111-222"))
  }

  test("vocab_topk: contiguous ranks, non-increasing counts, honest top-1") {
    val out = run("vocab_topk").collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to out.length).toSeq)
    val occs = out.map(_.getAs[Long]("n_occ"))
    assert(occs.zip(occs.tail).forall { case (a, b) => a >= b },
      "counts must be non-increasing in rank")
    assert(out.forall(r => r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occ")))
    // independent recount of the rank-1 token
    val top = out.head
    val recount = Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === top.getAs[String]("token")).count()
    assert(recount == top.getAs[Long]("n_occ"))
  }

  test("text_compress: repetition compresses harder than diverse text") {
    graft.plans.GraftFunctions.register(spark)
    val fixture = Seq(
      (1L, "spam " * 200),                                 // templated
      (2L, (1 to 200).map(i => s"w$i").mkString(" ")),     // diverse
      (3L, scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).alphanumeric.take(1000).mkString)) // noise
      .toDF("doc_id", "text")
    val rows = fixture
      .withColumn("n_bytes", length(col("text")).cast("long"))
      .withColumn("n_deflated", expr("graft_deflate_len(cast(text AS binary))"))
      .withColumn("compress_ratio",
        round(col("n_deflated") / col("n_bytes"), 6))
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Double]("compress_ratio")).toMap
    assert(rows(1L) < rows(2L) && rows(2L) < rows(3L),
      s"ordering violated: $rows")
    assert(rows(1L) < 0.1, s"templated text should crush: ${rows(1L)}")
    assert(rows(3L) > 0.5, s"noise should resist: ${rows(3L)}")
    // the sf op runs and ratios are sane
    val op = run("text_compress").collect()
    assert(op.nonEmpty && op.forall { x =>
      val c = x.getAs[Double]("compress_ratio")
      c > 0.0 && c < 1.2
    })
  }

  test("quality_filter: every gate fires on its planted doc, first reason wins") {
    val fixture = Seq(
      1L -> "tiny doc",                                         // short
      2L -> ("der hund und die katze ist der hund und die " +
        "katze ist der hund und die katze"),                    // lang (de)
      3L -> ("11 22 33 44 55 66 77 88 99 00 12 34 56 78 90 " +
        "21 the of and to"),                                    // digits
      4L -> ("alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa lambda mu nu xi omicron pi"),               // stopwords
      5L -> ("the of and to in the of and to in the of and " +
        "to in the of and to in"),                              // distinct
      6L -> ("the cat sat on of mat\nthe cat sat on of " +
        "mat\nthe dog ran to in park"),                         // dup_lines
      7L -> ("the cat the cat the cat the cat w1 w2 w3 w4 " +
        "w5 w6 w7 w8"),                                         // top_bigram
      8L -> ("the quick brown fox jumps over of lazy dog " +
        "and then runs to in park every day"))                  // ok
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis.qualityFilter(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("reason"), r.getAs[Long]("keep"))).toMap
    assert(out == Map(
      1L -> ("short", 0L), 2L -> ("lang", 0L), 3L -> ("digits", 0L),
      4L -> ("stopwords", 0L), 5L -> ("distinct", 0L),
      6L -> ("dup_lines", 0L), 7L -> ("top_bigram", 0L), 8L -> ("ok", 1L)),
      s"gate decisions wrong: $out")
    // op level: keep bit is exactly reason == ok; both outcomes occur
    val op = run("quality_filter")
    assert(op.filter(($"reason" === "ok") =!= ($"keep" === 1L)).count() == 0)
    assert(op.filter($"keep" === 1L).count() > 0)
    assert(op.filter($"keep" === 0L).count() > 0)
  }

  test("keyword_tfidf: rare repeated tokens outrank common ones; heap plan") {
    // doc 1's "zebra" appears twice and only there (df=1): score
    // 2·(4000 DIV 1) = 8000. "the" is everywhere (df=4): tf·(4000 DIV 4)
    // = tf·1000 — the corpus-wide term can never beat the rare one.
    val fixture = Seq(
      1L -> "the zebra saw the zebra cross",
      2L -> "the cat sat here quietly today",
      3L -> "the dog ran fast and far",
      4L -> "the bird flew high above town")
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis.keywordTfidf(fixture).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val top1 = out(1L).minBy(_.getAs[Long]("rk"))
    assert(top1.getAs[String]("token") == "zebra" &&
      top1.getAs[Long]("score") == 8000L,
      s"doc 1 top keyword: ${top1}")
    // every doc yields exactly KwPerDoc ranked keywords, scores
    // non-increasing, ties broken lexicographically
    out.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to 3L))
      val scores = sorted.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // the per-doc ranking must run through the heap operator, not a
    // window sort over the full tf frame
    val plan = run("keyword_tfidf").queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
  }

  test("quantile_bins: quartile cutoffs without a global sort; bins balanced") {
    val out = run("quantile_bins").collect()
    val n = out.length
    assert(n > 0)
    // every doc gets a bin; bin boundaries respect the cutoffs row-wise
    out.foreach { r =>
      val (t, b) = (r.getAs[Long]("n_toks"), r.getAs[Long]("bin"))
      val (q1, q2, q3) = (r.getAs[Double]("q1"), r.getAs[Double]("q2"),
        r.getAs[Double]("q3"))
      assert(q1 <= q2 && q2 <= q3)
      val expect = if (t <= q1) 0L else if (t <= q2) 1L else if (t <= q3) 2L else 3L
      assert(b == expect, s"n_toks $t got bin $b vs cutoffs ($q1,$q2,$q3)")
    }
    // quartiles: every bin holds >= 15% of docs (exact interpolated
    // cutoffs on a non-degenerate distribution)
    val byBin = out.groupBy(_.getAs[Long]("bin")).view.mapValues(_.length)
    assert(byBin.keys.toSet == Set(0L, 1L, 2L, 3L), s"bins: ${byBin.toMap}")
    byBin.foreach { case (b, c) =>
      assert(c >= n * 0.15, s"bin $b holds only $c of $n docs")
    }
    // the plan must NOT contain a global sort (the ntile anti-pattern)
    val plan = run("quantile_bins").queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"quantile binning must not globally sort:\n$plan")
  }

  test("data_card: slice sums reconcile with the corpus; shares sum to ~10000 bp") {
    val out = run("data_card").collect()
    val d = Tables(spark, sfDir, "documents")
    assert(out.map(_.getAs[Long]("n_docs")).sum == d.count())
    val totChars = d.agg(sum($"n_chars")).head.getLong(0)
    assert(out.map(_.getAs[Long]("sum_chars")).sum == totChars)
    // integer-floor shares: each slice's bp is exact, the total can
    // undershoot 10000 by at most the slice count
    val bpSum = out.map(_.getAs[Long]("doc_share_bp")).sum
    assert(bpSum <= 10000L && bpSum > 10000L - out.length, s"bp sum $bpSum")
    // hand-check one slice against a direct filter
    val r = out.head
    val direct = d.filter($"lang" === r.getAs[String]("lang") &&
      $"source" === r.getAs[String]("source")).count()
    assert(r.getAs[Long]("n_docs") == direct)
    // the corpus is scanned ONCE — inside the localCheckpoint that
    // materializes the skinny group frame; the final plan reads only
    // that checkpoint (zero parquet scans: totals and shares fold
    // from ≤ langs × sources rows, never a second pass)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("data_card").queryExecution.executedPlan
      assert(plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.isEmpty, s"final plan re-scans the corpus:\n$plan")
      assert(plan.toString.contains("Scan ExistingRDD"),
        s"expected the checkpointed group frame:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("index_build: postings are sorted, capped, and recoverable") {
    val fixture = Seq(
      1L -> "apple banana apple",
      2L -> "banana cherry",
      12L -> "apple")  // 2-digit doc id exercises the zero-pad ordering
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis.indexBuild(fixture).collect()
      .map(r => r.getAs[String]("token") -> r).toMap
    val apple = out("apple")
    assert(apple.getAs[Long]("n_postings") == 3L)
    assert(apple.getAs[Long]("n_docs") == 2L)
    // numeric order via the zero-padded encoding: doc 1 (pos 0, 2), doc 12
    assert(apple.getAs[String]("posting") ==
      "00000001:000000,00000001:000002,00000012:000000")
    assert(out("cherry").getAs[String]("posting") == "00000002:000001")
    // op level: posting length never exceeds the cap
    val op = run("index_build").collect()
    assert(op.nonEmpty)
    op.foreach { r =>
      val entries = r.getAs[String]("posting").split(",").length
      assert(entries <= operators.TextAnalysis.PostingCap &&
        entries <= r.getAs[Long]("n_postings"))
    }
  }

  test("index_build: cap enforced BEFORE aggregation — bounded buffers") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // the collect_list that assembles posting strings must sit ABOVE
    // the bounded TopKPerKey heaps, so its buffer only ever holds
    // <= PostingCap rows per token — never the full posting list of a
    // stopword (O(corpus) rows in one buffer at 100 TB)
    val plan = run("index_build").queryExecution.sparkPlan
    val collectAggs = plan.collect {
      case a: BaseAggregateExec if a.aggregateExpressions
        .exists(_.aggregateFunction.toString.contains("collect_list")) => a
    }
    assert(collectAggs.nonEmpty, s"expected a collect_list aggregate:\n$plan")
    collectAggs.foreach { a =>
      assert(a.find(_.getClass.getSimpleName.startsWith("TopKPerKey")).isDefined,
        s"collect_list must aggregate the heap-capped frame, not the raw postings:\n$a")
    }
    // flood fixture: one token in EVERY doc — the exact shape the cap
    // exists for. The output row is capped at the numerically smallest
    // PostingCap entries while the counts keep the true totals.
    val cap = operators.TextAnalysis.PostingCap
    val n = cap + 50
    val flood = (1 to n).map(i => i.toLong -> "flood").toDF("doc_id", "text")
    val row = operators.TextAnalysis.indexBuild(flood).collect()
      .find(_.getAs[String]("token") == "flood").get
    assert(row.getAs[Long]("n_postings") == n.toLong)
    assert(row.getAs[Long]("n_docs") == n.toLong)
    val posting = row.getAs[String]("posting").split(",")
    assert(posting.length == cap, s"expected $cap entries, got ${posting.length}")
    // bottom-cap in numeric order: docs 1..cap at pos 0
    assert(posting.head == "00000001:000000" &&
      posting.last == f"$cap%08d:000000")
    assert(posting.toSeq == posting.toSeq.sorted)
  }

  test("sample_temperature: keep test stays exact past int64 overflow") {
    val m = operators.Sampling.MixMod
    // ns = 10^10-doc sources (every real 100 TB corpus): h²·ns ≈ 10^22
    // overflows int64 (≈9.2·10^18); the decimal(38,0) path must agree
    // with BigInt ground truth on both keep and drop outcomes
    val cases = Seq(
      (m - 1L, 10000000000L, 1000000L),     // large h, heavy source → drop
      (m - 1L, 10000000000L, 10000000000L), // ns == nmin → always keep
      (123456L, 10000000000L, 9999999L),    // small h → keep
      (1048000L, 40000000000L, 39999999L))  // h ~ M, ratio ~1 → boundary
    val df = cases.toDF("h", "ns", "nmin")
      .withColumn("keep",
        operators.Sampling.tempKeep(col("h"), col("ns"), col("nmin")))
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getBoolean(3)).toMap
    cases.foreach { case t @ (h, ns, nmin) =>
      val expect =
        BigInt(h) * BigInt(h) * BigInt(ns) < BigInt(m) * BigInt(m) * BigInt(nmin)
      assert(got(t) == expect, s"case $t: got ${got(t)}, BigInt says $expect")
    }
    // prove the fixture is meaningful: the raw int64 product would wrap
    assert(BigInt(m - 1) * (m - 1) * 10000000000L > BigInt(Long.MaxValue))
  }

  test("quality_filter: the whole gate is ONE narrow scan — no Exchange at all") {
    import org.apache.spark.sql.execution.exchange.Exchange
    // every signal — language hits, ratios, and (r11) the repetition
    // pair via the TopGramCount kernel — is a per-row expression over
    // the one corpus scan: the plan must contain no exchange of any
    // kind (the old shape shuffled skinny (doc, bigram) counts and
    // joined back; the spec then only pinned text out of exchanges).
    // AQE off so executedPlan is a plain tree.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("quality_filter").queryExecution.executedPlan
      val exchanges = plan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"quality gate must be fully narrow:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("curate_e2e: planted fixture drops exactly one doc set per stage") {
    graft.plans.GraftFunctions.register(spark)
    // 19 distinct filler words + one shared stopword; every token
    // carries a letters-only per-doc tag so cross-doc shingle overlap
    // is zero (no accidental near-dup candidates, no digit-gate hits)
    val names = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra")
    def tag(i: Long) = i.toString.map(c => ('a' + (c - '0')).toChar).mkString
    def good(t: String) = "the " + names.map(w => s"$w$t").mkString(" ")
    val web = (Seq(1L, 2L) ++ (4L to 40L)).map(i => (i, good(tag(i)), "web"))
    val dup = Seq((3L, good(tag(2L)), "web"))   // exact copy of doc 2
    val books = (101L to 105L).map(i => (i, good(tag(i)), "books"))
    val bad = Seq((900L, "tiny doc", "web"))    // fails the length gate
    // classifier-stage plant: passes every quality_filter heuristic
    // (25 tokens, 13 distinct, all-letters, one stopword, no repeated
    // bigram) but is saturated with the model's junk vocabulary —
    // dropped only by the TRAINED stage
    val junkWords = ('a' to 'l').map(c => s"qjunk$c")
    val junkText = ("the" +: (junkWords ++
      Seq(0, 2, 4, 6, 8, 10, 1, 3, 5, 7, 9, 11).map(junkWords))).mkString(" ")
    val junk = Seq((950L, junkText, "web"))
    // blocklist-stage plant: passes every heuristic AND the trained
    // gate (21 distinct letter tokens, one stopword, junk-free) but
    // carries the blocklisted term — dropped by stage 0 alone
    val blocked = Seq((960L, good(tag(960L)) + " dup", "web"))
    // the frozen model, hand-built so every stage decision stays
    // exactly derivable: junk buckets weigh -0.5 per occurrence,
    // intercept +2 — 24 junk hits sink doc 950 to z = -10 while a
    // stray hash collision on a 20-token good doc costs at most a few
    // -0.5 steps against +2 (composition is model-agnostic; training
    // itself is pinned by QualityClassifierSpec)
    val junkBuckets = Seq(junkWords).toDF("toks")
      .select(operators.QualityClassifier.featureIdx(col("toks")).as("b"))
      .head.getSeq[Int](0)
    val w = Array.fill(operators.QualityClassifier.NumFeatures)(0.0)
    junkBuckets.foreach(b => w(b) = -0.5)
    val model = operators.QualityClassifier.Model(w, 2.0)
    val fixture = (web ++ dup ++ books ++ bad ++ junk ++ blocked)
      .toDF("doc_id", "text", "source")
    val m = operators.Curate.curateE2e(fixture, model).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m.size == 48) // 39 web + dup + 5 books + quality-fail + junk + blocked
    // stage 0: blocklist — the doc every OTHER gate would keep
    // (heuristics read "ok", the model scores it well above the bar)
    assert(m(960L).getAs[String]("stage") == "blocklist" &&
      m(960L).getAs[String]("qf_reason") == "ok" &&
      m(960L).getAs[Double]("cls_prob") >= operators.Curate.ClassifierMinProb,
      s"${m(960L)}")
    // stage 1: quality — the short doc, with its first failing reason
    assert(m(900L).getAs[String]("stage") == "quality" &&
      m(900L).getAs[String]("qf_reason") == "short", s"${m(900L)}")
    // stage 2: classifier — the junk-vocab doc passed the heuristics
    // (reason "ok") and fell only to the trained gate
    assert(m(950L).getAs[String]("stage") == "classifier" &&
      m(950L).getAs[String]("qf_reason") == "ok" &&
      m(950L).getAs[Double]("cls_prob") < operators.Curate.ClassifierMinProb,
      s"${m(950L)}")
    // stage 3: dedup — the exact copy folds into doc 2's cluster
    assert(m(3L).getAs[String]("stage") == "dedup" &&
      m(3L).getAs[Long]("cluster_id") == 2L, s"${m(3L)}")
    // stage 4: mix — replay the exact α=1/2 keep formula driver-side
    // over the dedup survivors (39 web, 5 books → nmin = 5)
    val M = operators.Sampling.MixMod
    val webIds = Seq(1L, 2L) ++ (4L to 40L)
    val expectMixDrop = webIds.filter { i =>
      val h = (i * operators.Sampling.TempMul) % M
      BigInt(h) * h * webIds.length >= BigInt(M) * M * 5
    }.toSet
    assert(expectMixDrop.nonEmpty, "fixture must drop at least one doc at mix")
    val gotMixDrop = m.values.filter(_.getAs[String]("stage") == "mix")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(gotMixDrop == expectMixDrop,
      s"mix drops: got $gotMixDrop expected $expectMixDrop")
    // the smallest source is never downsampled at α = 1/2
    (101L to 105L).foreach(i => assert(m(i).getAs[String]("stage") == "kept"))
    // kept docs carry pack coordinates; dropped docs carry sentinels
    m.values.foreach { r =>
      if (r.getAs[String]("stage") == "kept") {
        assert(r.getAs[String]("qf_reason") == "ok")
        assert(r.getAs[Long]("n_seqs") >= 1L && r.getAs[Long]("first_seq") >= 0L)
      } else {
        assert(r.getAs[Long]("n_seqs") == 0L &&
          r.getAs[Long]("first_seq") == -1L)
      }
    }
    // funnel totals: 47 in = quality + classifier + dedup + mix + kept
    val byStage = m.values.groupBy(_.getAs[String]("stage"))
      .view.mapValues(_.size).toMap
    assert(byStage == Map("blocklist" -> 1, "quality" -> 1,
      "classifier" -> 1, "dedup" -> 1,
      "mix" -> expectMixDrop.size, "kept" -> (44 - expectMixDrop.size)),
      s"funnel: $byStage")
  }

  test("curate_e2e: corpus text crosses at most one exchange, whole chain") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.util.QueryExecutionListener
    graft.plans.GraftFunctions.register(spark)
    // every job the chain runs (checkpoint materializations included)
    // flows through the listener; count text-carrying shuffles across
    // ALL of them — the chain's contract is at most one
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    // real driver syncs = Spark JOBS (a lazy checkpoint registers a
    // QueryExecution but runs no job, so the query-execution count
    // over-reports; the job count is what 100 TB stage latency pays)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobListener = new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.listenerManager.register(listener)
    spark.sparkContext.addSparkListener(jobListener)
    try {
      // frozen pass-through model (zero weights, positive intercept):
      // the classifier stage's PLAN SHAPE — the per-row fold on the
      // survivor gather and the manifest projection — is identical for
      // any weights, and training happens outside this chain by design
      operators.Curate.curateE2e(Tables(spark, sfDir, "documents"),
          operators.QualityClassifier.Model(
            Array.fill(operators.QualityClassifier.NumFeatures)(0.0), 2.0))
        .write.format("noop").mode("overwrite").save()
      // listener delivery is async; the plans-quiesce loop below also
      // gives the job-end events time to drain
      // listener delivery is async — wait for the queue to quiesce
      var last = -1
      while (plans.size != last) { last = plans.size; Thread.sleep(500) }
      assert(plans.size > 0, "listener captured no query executions")
      val textShuffles = plans.toArray(Array.empty[
          org.apache.spark.sql.execution.SparkPlan])
        .flatMap(_.collect {
          // broadcasts count too: pinning the corpus text on every
          // executor is still the text crossing an exchange
          case e: org.apache.spark.sql.execution.exchange.Exchange
              if e.output.exists(_.name == "text") => e
        })
      assert(textShuffles.length <= 1,
        s"corpus text crossed ${textShuffles.length} exchanges:\n" +
          textShuffles.mkString("\n---\n"))
      // job-count budget: the guard counts now MATERIALIZE their lazily
      // checkpointed frames in their own job (qf, dedup's groups and
      // candDocs — three eager-checkpoint jobs gone vs the r5 shape);
      // pin the budget so a checkpoint+count pair doesn't creep back in
      info(s"curate chain ran ${jobs.get} Spark jobs")
      assert(jobs.get <= 34,
        s"curate chain ran ${jobs.get} jobs (r5 shape: 37, lazy-guard " +
          "shape: 34; a guard count stopped sharing its " +
          "materialization job?)")
    } finally {
      spark.sparkContext.removeSparkListener(jobListener)
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("ann_pq: recall vs exact top-5 clears the structureless-data bound") {
    // synthetic embeddings are near-random — PQ's worst case (measured
    // mean recall@5 ≈ 0.62 here; clustered real corpora do far better).
    // Bound mean ≥ 0.5 and every query ≥ 0.2 so a codebook or ADC
    // regression fails loudly without flaking on the data's noise.
    val exact = run("ann_cosine_topk").collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    val pq = run("ann_pq").collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    assert(pq.keySet == exact.keySet)
    pq.values.foreach(s => assert(s.size == 5))
    val recalls = exact.keys.toSeq.sorted
      .map(q => (pq(q) & exact(q)).size / 5.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@5 $mean < 0.5 (per-query: $recalls)")
    recalls.foreach(r => assert(r >= 0.2, s"a query fell to recall $r"))
  }

  test("dedup_pipeline: corpus text crosses at most one exchange") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    graft.plans.GraftFunctions.register(spark)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.listenerManager.register(listener)
    try {
      run("dedup_pipeline").write.format("noop").mode("overwrite").save()
      var last = -1
      while (plans.size != last) { last = plans.size; Thread.sleep(500) }
      val textMoves = plans.toArray(Array.empty[
          org.apache.spark.sql.execution.SparkPlan])
        .flatMap(_.collect {
          case e: org.apache.spark.sql.execution.exchange.Exchange
              if e.output.exists(_.name == "text") => e
        })
      assert(textMoves.length <= 1,
        s"dedup_pipeline moved the corpus text ${textMoves.length} times:\n" +
          textMoves.mkString("\n---\n"))
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("exact percentile domains are bounded (buffer = O(distinct), not O(rows))") {
    // score_stats buffers distinct integer cents, quantile_bins distinct
    // token counts — pin the bounded-domain argument to the data:
    // distinct values ≪ rows, and the domains are the documented ones
    val cents = Tables.events(spark, sfDir)
      .selectExpr("CAST(ROUND(value * 100) AS BIGINT) AS c")
    val (nRows, nDistinct) = (cents.count(),
      cents.distinct().count())
    assert(nDistinct <= 100001L,
      s"cents domain unbounded? $nDistinct distinct")
    val toks = Tables(spark, sfDir, "documents")
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS n")
    val tokMax = toks.agg(max($"n")).head().getLong(0)
    val tokDistinct = toks.distinct().count()
    assert(tokDistinct <= tokMax + 1,
      s"token-count domain exceeds its max-doc-length bound: $tokDistinct > $tokMax")
    assert(nRows > 0 && nDistinct > 0)
  }

  test("dedup_semantic: planted duplicate directions collapse, lowest id kept") {
    // scaled copies have cosine exactly 1 (direction is all that
    // matters), so both land in the same nearest-cosine cluster and the
    // larger id must drop; the orthogonal vector keeps with no pairs
    def oneHot(i: Int, s: Float) =
      Array.tabulate(8)(j => if (j == i) s else 0f)
    val e = Seq(
      (1L, oneHot(0, 1f)), (2L, oneHot(0, 2f)), // same direction: dup pair
      (3L, oneHot(1, 1f))                       // orthogonal: unique
    ).toDF("vec_id", "embedding")
    val m = Similarity.semanticDedup(e, 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_sim"), r.getAs[Double]("max_cos"),
          r.getAs[Long]("keep"))).toMap
    assert(m(1L) == ((1L, 1.0, 1L)), s"${m(1L)}")  // kept: smallest id
    assert(m(2L) == ((1L, 1.0, 0L)), s"${m(2L)}")  // dropped: dup of 1
    assert(m(3L) == ((0L, -1.0, 1L)), s"${m(3L)}") // unique: no pairs
  }

  test("dedup_semantic: oversized clusters sub-split — pair volume bounded") {
    // a degenerate corpus (every vector identical) puts all N rows in
    // ONE cluster: unsalted, the self-join would compare N(N-1)/2 pairs
    // (~1.1 M at N=1500); the xxhash sub-split caps sub-buckets near
    // SemMaxCluster so total pair volume stays ~N·SemMaxCluster.
    val n = 1500
    val e = (1L to n.toLong).map(i => (i, Array.tabulate(8)(_.toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(e, 4).cache()
    try {
      val sumSim = out.agg(sum(col("n_sim"))).head.getLong(0)
      assert(sumSim > 0, "flood found no pairs at all")
      assert(sumSim < 1000000L,
        s"pair volume $sumSim ≈ unsalted O(n²) — sub-split not engaged")
      // exactly one keeper per sub-bucket chain; everything else drops
      assert(out.filter(col("keep") === 1L).count() < n / 4)
    } finally out.unpersist()
  }

  test("dedup_semantic: cluster sizing is a skinny aggregate, not a window") {
    // the rejected plan computed populations with count().over(
    // partitionBy(cluster)), which buffers an entire cluster's rows in
    // ONE window task — on the degenerate one-giant-cluster corpus the
    // largest cluster is O(n) rows and that task spills before the
    // sub-split salt exists. The shipped plan must carry NO WindowExec
    // anywhere; sizes come from groupBy(cluster).count() broadcast back
    // (bounded by k ≤ KmeansMaxK rows).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("dedup_semantic").queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
        s"a window buffers whole clusters in single tasks:\n$plan")
      // a cluster-keyed shuffle is allowed only for the skinny count
      // partials (cluster, cn); the assignment frame itself (rows with
      // vec_id) must never be redistributed on cluster for sizing
      val badShuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] &&
              e.outputPartitioning.asInstanceOf[
                org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
                .expressions.collect {
                  case a: org.apache.spark.sql.catalyst.expressions.Attribute
                    => a.name }.toSet == Set("cluster") &&
              e.output.exists(_.name == "vec_id") => e
      }
      assert(badShuffles.isEmpty,
        s"assignment frame shuffled on cluster for sizing:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dedup_semantic: every dropped vector is a verified near-dup (precision 1)") {
    val out = run("dedup_semantic").filter(col("keep") === 0L)
      .filter(col("max_cos") < Similarity.SemTau)
    assert(out.count() == 0, "a vector dropped without a verified similar pair")
  }

  test("ngram_lm: hand-computed add-one surprisal; frequent bigrams score lower") {
    // corpus: V = {a,b,c,x,e} = 5 distinct tokens.
    //   bigram counts: (a,b)=2 (b,a)=1 (b,c)=1 (c,c)=1 (e,e)=8
    //   context counts: a=2 b=2 c=1 e=8
    // s(w2|w1) = ilog2((c1+V)*65536 div (c12+1)):
    //   (a,b): (2+5)*65536 div 3 = 152917 → 17    (b,a)/(b,c): 229376 → 17
    //   (c,c): (1+5)*65536 div 2 = 196608 → 17    (e,e): 13*65536 div 9 = 94663 → 16
    val docs = Seq(
      (1L, "a b a b c"),         // 4 bigrams, sum 68 → 68/4 - 16 = 1.0
      (2L, "c c"),               // 1 bigram, 17 → 1.0
      (3L, "x"),                 // no bigram → sentinel
      (4L, "e e e e e e e e e")  // 8 bigrams of the FREQUENT pair → 0.0
    ).toDF("doc_id", "text")
    val m = operators.LangModel.ngramLm(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_surprisal"),
          r.getAs[Double]("bits_per_token"))).toMap
    assert(m(1L) == ((4L, 68L, 1.0)), s"${m(1L)}")
    assert(m(2L) == ((1L, 17L, 1.0)), s"${m(2L)}")
    assert(m(3L) == ((0L, 0L, -1.0)), s"${m(3L)}")
    assert(m(4L) == ((8L, 128L, 0.0)), s"${m(4L)}")
    // the quality-signal property the op exists for: the doc made of the
    // corpus-frequent bigram is "less surprising" than the rare-bigram docs
    assert(m(4L)._3 < m(1L)._3)
  }

  test("ngram_lm: surprisal stays int64-exact at beyond-100TB counts") {
    // the documented bound: (c1 + V) * 65536 < 2^63 needs c1 + V < 2^47.
    // Drive the exact expression the operator uses at counts far past
    // any real corpus (2^45 ≈ 3.5e13 context occurrences — 100 TB of
    // text is ~2e13 tokens TOTAL) and check against BigInt ground truth.
    val cases = Seq(
      (1L << 45, 1L << 40, 1L),          // degenerate hot context, rare bigram
      (1L << 45, 1L << 40, 1L << 30),    // hot context, hot bigram
      ((1L << 46) + 12345L, 999L, 7L),   // near the 2^47 headroom edge
      (3L, 2L, 1L))                      // tiny corpus sanity
    val df = cases.toDF("c1", "v", "c12")
      .withColumn("s",
        (length(bin(expr(s"((c1 + v) * ${operators.LangModel.LmScale}) DIV (c12 + 1)"))) - 1)
          .cast("long"))
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    cases.foreach { case t @ (c1, v, c12) =>
      val q = (BigInt(c1) + BigInt(v)) * operators.LangModel.LmScale / (BigInt(c12) + 1)
      val expect = q.bitLength - 1 // ilog2 for q >= 1
      assert(got(t) == expect.toLong, s"case $t: got ${got(t)}, BigInt says $expect")
      // prove the fixture is meaningful: the product approaches but
      // never crosses int64 under the documented bound
      assert((BigInt(c1) + BigInt(v)) * operators.LangModel.LmScale
        <= BigInt(Long.MaxValue))
    }
  }

  test("colloc_pmi: exclusive pairs outrank high-marginal self-pairs") {
    // 4 docs of 12 tokens → 11 bigrams each, N = 44.
    //   (x,y): c12=6, c1x=6, c1y=5 → expect = 30//44 = 0 →
    //          s = ilog2(6·65536 div 1) = 18 → pmi_bits = 2
    //   (z,z): c12=11, c1z=11      → expect = 121//44 = 2 →
    //          s = ilog2(11·65536 div 3) = 17 → pmi_bits = 1
    // the exclusively-co-occurring pair beats the frequent self-pair —
    // exactly the signal phrase detection ranks on
    def alt(a: String, b: String) = Seq.fill(6)(s"$a $b").mkString(" ")
    val docs = Seq(
      (1L, alt("x", "y")), (2L, alt("p", "q")), (3L, alt("m", "n")),
      (4L, Seq.fill(12)("z").mkString(" "))).toDF("doc_id", "text")
    val out = operators.LangModel.collocPmi(docs).collect()
    val m = out.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
      (r.getAs[Long]("c12"), r.getAs[Long]("pmi_bits"))).toMap
    assert(m(("x", "y")) == ((6L, 2L)), s"${m(("x", "y"))}")
    assert(m(("y", "x")) == ((5L, 2L)), s"${m(("y", "x"))}")
    assert(m(("z", "z")) == ((11L, 1L)), s"${m(("z", "z"))}")
    // the self-pair ranks LAST despite having the highest raw count
    val zRank = out.find(r => r.getAs[String]("w1") == "z").get
      .getAs[Long]("rank")
    assert(zRank == out.map(_.getAs[Long]("rank")).max,
      s"z-z should rank last, got $zRank of ${out.length}")
  }

  test("colloc_pmi: ranking is TakeOrdered heaps; no corpus-sized window") {
    // the global top-K runs through TakeOrderedAndProject's per-
    // partition heaps (K rows per task reach the driver); the rank
    // window is allowed ONLY above the K-row limit — a WindowExec fed
    // by the unbounded scored frame would buffer every bigram type in
    // one task
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("colloc_pmi").queryExecution.executedPlan
      assert(plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, s"top-K must be TakeOrdered heaps:\n$plan")
      plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.foreach { w =>
        assert(w.child.collectFirst {
          case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
          case l: org.apache.spark.sql.execution.GlobalLimitExec => l
        }.nonEmpty,
          s"a window runs over the un-limited scored frame:\n$w")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("colloc_pmi: expectation stays exact where int64 c1a*c1b would wrap") {
    // at 100 TB each marginal can reach ~2e13: c1a*c1b ≈ 4e26 wraps
    // int64 (9.2e18) but fits decimal(38,0). Drive the exact expression
    // the operator uses and check the quotient + pmi against BigInt.
    val big = 20_000_000_000_000L // 2e13
    val cases = Seq(
      (big, big, big, 5L),          // max marginals, rare pair
      (big, 3L, big, 5L),           // asymmetric marginals
      (1L << 40, 1L << 40, 1L << 41, 1L << 20)) // powers of two
    val df = cases.toDF("c1a", "c1b", "n", "c12")
      .withColumn("expect", expr(
        "CAST((CAST(c1a AS DECIMAL(38,0)) * CAST(c1b AS DECIMAL(38,0))) " +
          "DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("pmi_bits",
        (length(bin(expr(s"(c12 * ${operators.LangModel.LmScale}) DIV (expect + 1)"))) - 1
          - operators.LangModel.LmScaleBits).cast("long"))
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        (r.getLong(4), r.getLong(5))).toMap
    cases.foreach { case t @ (c1a, c1b, n, c12) =>
      val expect = BigInt(c1a) * BigInt(c1b) / n
      val q = BigInt(c12) * operators.LangModel.LmScale / (expect + 1)
      val pmi = (if (q >= 1) q.bitLength - 1 else 0) -
        operators.LangModel.LmScaleBits
      assert(got(t) == ((expect.toLong, pmi.toLong)),
        s"case $t: got ${got(t)}, BigInt says ($expect, $pmi)")
    }
    // the fixture is meaningful: the raw int64 product would wrap
    assert(BigInt(big) * big > BigInt(Long.MaxValue))
  }

  test("perplexity_filter: frozen reference model, OOV penalty, per-lang thirds") {
    // reference slice (src0..src4): "a b a b a b" + "a b a b"
    //   → c2: (a,b)=5 (b,a)=3; c1: a=5 b=3; V = {a,b} = 2
    // s(a,b) = ilog2(7·65536 div 6 = 76458)  = 16
    // s(b,a) = ilog2(5·65536 div 4 = 81920)  = 16
    // fully-OOV bigram: ilog2((0+2)·65536 div 1) = 17
    // OOV continuation of known context b: ilog2((3+2)·65536 div 1) = 18
    val docs = Seq(
      (1L, "a b a b a b", "en", "src0"),
      (2L, "a b a b", "en", "src0"),
      (3L, "a b a b", "en", "src9"),    // in-model: 2·16+16 = 48, bpt 0.0
      (4L, "q r s t u v", "en", "src9"),// 5 OOV bigrams · 17 = 85, bpt 1.0
      (5L, "z", "en", "src9"),          // bigram-less → sentinel, ranked last
      (6L, "a b q r", "en", "src9")     // 16 + 18 + 17 = 51, bpt 1.0
    ).toDF("doc_id", "text", "lang", "source")
    val out = operators.LangModel.perplexityFilter(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_surprisal"),
          r.getAs[Double]("bits_per_token"), r.getAs[String]("bucket")))).toMap
    assert(out(3L) == ((3L, 48L, 0.0, "middle")), s"${out(3L)}")
    assert(out(4L) == ((5L, 85L, 1.0, "middle")), s"${out(4L)}")
    assert(out(6L) == ((3L, 51L, 1.0, "tail")), s"${out(6L)}")
    assert(out(5L) == ((0L, 0L, -1.0, "tail")), s"${out(5L)}")
    // 6 docs, one lang → thirds of 2: ranks (by mean surprisal, doc_id
    // ties, bigram-less last) are 1,2,3 @ ord 16 then 4,6 @ 17 then 5
    assert(out(1L)._4 == "head" && out(2L)._4 == "head")
    // the CCNet property: reference-like text beats out-of-domain text
    assert(out(3L)._3 < out(4L)._3)
  }

  test("perplexity_cuts_sketch: scores == exact; disagreement confined to the rank band; adjacent buckets only") {
    val exact = run("perplexity_filter").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_surprisal"),
          r.getAs[Double]("bits_per_token"), r.getAs[String]("bucket")))).toMap
    val sk = run("perplexity_cuts_sketch")
    assert(sk.columns.toSeq == Seq("doc_id", "lang", "n_bigrams",
      "sum_surprisal", "bits_per_token", "bucket"))
    val skm = sk.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_surprisal"),
          r.getAs[Double]("bits_per_token"), r.getAs[String]("bucket"),
          r.getAs[String]("lang")))).toMap
    assert(skm.keySet == exact.keySet)
    // the SCORES are mode-independent — only the bucket boundary may move
    skm.foreach { case (id, (n, s, bpt, _, _)) =>
      assert((n, s, bpt) == ((exact(id)._1, exact(id)._2, exact(id)._3)),
        s"doc $id: sketch-mode scores diverged from exact")
    }
    // exact per-language ranks, driver-side on the skinny stats
    val ranked = skm.toSeq.groupBy(_._2._5).map { case (lang, ds) =>
      val ordered = ds.sortBy { case (id, (n, s, _, _, _)) =>
        (if (n == 0L) 1 else 0, if (n == 0L) 0.0 else s.toDouble / n, id)
      }.map(_._1)
      lang -> ordered
    }
    val buckets = Seq("head", "middle", "tail")
    var disagree = 0
    skm.foreach { case (id, (_, _, _, b, lang)) =>
      val eb = exact(id)._4
      if (b != eb) {
        disagree += 1
        assert(math.abs(buckets.indexOf(b) - buckets.indexOf(eb)) == 1,
          s"doc $id: sketch bucket $b not adjacent to exact $eb")
        // a flip is legal ONLY inside the ±1.65% rank band (+1 doc
        // discretization slack) around one of the two cut positions
        val order = ranked(lang)
        val nl = order.size
        val rn = order.indexOf(id) + 1
        val band = 0.0165 * nl + 1.0
        val nearCut = Seq((nl + 2) / 3, (2 * nl + 2) / 3)
          .exists(b3 => math.abs(rn - b3) <= band)
        assert(nearCut,
          s"doc $id (rank $rn/$nl in $lang) flipped $eb→$b outside the band")
      }
    }
    assert(disagree <= skm.size / 10,
      s"sketch mode disagrees on $disagree/${skm.size} docs")
  }

  test("perplexity_cuts_sketch: deployment path has no window over the per-doc frame") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = Tables(spark, sfDir, "documents")
      val (c2, c1, v) = operators.LangModel.refCounts(docs)
      val perDoc = operators.LangModel.scoreAgainst(docs, c2, c1, v)
      // cut derivation + application, exactly what LmModel.refreshCuts
      // (default) + a scoring tick run — end to end, no WindowExec
      val deployed = operators.LangModel.applyCuts(perDoc,
        operators.LangModel.cutsFromPerDoc(perDoc))
      val wins = deployed.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.isEmpty,
        s"deployment path must not sort a language in one task:\n$wins")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("perplexity_filter: no Exchange carries the corpus text") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("perplexity_filter").queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, s"expected skinny count shuffles:\n$plan")
      (shuffles: Seq[org.apache.spark.sql.execution.SparkPlan]).foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"an exchange carries the corpus text:\n$e")
      }
      plan.collect { case e: BroadcastExchangeExec => e }.foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"a broadcast carries the corpus text:\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("graph_pagerank: equals an independent in-memory integer evaluation; hub ranks first") {
    // three user sessions; session 3 funnels into hub item 9
    val sessions = Seq(
      1L -> Seq(1, 2, 3, 1, 2),
      2L -> Seq(2, 1, 4),
      3L -> Seq(5, 9, 6, 9, 7, 9))
    var eid = 0L
    val ev = sessions.flatMap { case (u, its) =>
      its.map { it => eid += 1; (eid, u, s"""{"k": $it}""") }
    }.toDF("event_id", "user_id", "props")
    val got = operators.Graph.pagerank(ev).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

    // independent evaluation of the published recurrence in plain Scala
    val S = operators.Graph.PrScale
    val pairs = sessions.flatMap { case (_, its) => its.zip(its.tail) }
    val w = pairs.groupBy(identity).map { case (e, g) => e -> g.size.toLong }
    val outdeg = w.groupBy(_._1._1).map { case (s0, g) => s0 -> g.values.sum }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodes.size.toLong
    var r = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to operators.Graph.PrIters) {
      val cin = w.toSeq.groupBy(_._1._2).map { case (dst, es) =>
        dst -> es.map { case ((s0, _), we) => we * (r(s0) / outdeg(s0)) }.sum
      }
      r = nodes.map(v => v -> (15L * (S / n) + 85L * cin.getOrElse(v, 0L)) / 100L).toMap
    }
    assert(got == r, s"spark=$got\nref  =$r")
    // truncation only ever LEAKS rank mass — never creates it
    assert(got.values.sum <= S)
    assert(got(9) == got.values.max, "the funnel hub must rank first")
  }

  test("ann_range_search: exactly the pairs within the radius") {
    val out = run("ann_range_search").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val e = Tables(spark, sfDir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      q <- e.keys.filter(_ < 10); c <- e.keys if c != q
      if cos(e(q), e(c)) >= operators.Similarity.RangeTau
    } yield (q, c)).toSet
    assert(out.keySet == want,
      s"missing=${(want -- out.keySet).take(3)} extra=${(out.keySet -- want).take(3)}")
    out.values.foreach(v => assert(v >= operators.Similarity.RangeTau - 1e-6))
  }

  test("quality_gopher: each rule trips independently on planted docs") {
    // DISTINCT-word body so the repetition sub-table stays silent on
    // docs planted for the five legacy rules
    val base = Seq("the", "a") ++ (1 to 58).map(i => s"word$i")
    val good = base.mkString(" ")
    val short = "the a word word word"                  // n_words 5 < 50
    val longWords = (Seq("the", "a") ++
      Array.fill(58)("supercalifragilistic")).mkString(" ") // mwl > 10
    val symbols = (Seq("the", "a") ++ Array.fill(29)("word") ++
      Array.fill(29)("#")).mkString(" ")                // 29 '#' / 60 words
    val nonAlpha = (Seq("the", "a") ++ Array.fill(19)("word") ++
      Array.fill(39)("123")).mkString(" ")              // alpha 21/60 < 80 %
    val noStops = (1 to 60).map(i => s"word$i").mkString(" ") // 0 stop hits
    // repetition sub-table (r10): one doc per rule — a phrase of
    // exactly n words repeated with DISTINCT fillers between
    // occurrences, so no gram spanning a boundary ever repeats;
    // sub-grams of a repeated phrase inevitably repeat too, so each
    // doc asserts ITS signal crossed ITS ceiling, not exclusivity
    def planted(n: Int, reps: Int, tag: String): String = {
      val phrase = (1 to n).map(j => s"$tag${n}x$j")
      (base ++ (1 to reps).flatMap(k => phrase :+ s"fill$tag$n$k"))
        .mkString(" ")
    }
    val dupDocs = operators.TextAnalysis.GopherDupBp.map { case (n, _) =>
      n -> planted(n, 4, "repgram") }
    val topDocs = operators.TextAnalysis.GopherTopBp.map { case (n, _) =>
      n -> planted(n, 12, "topgram") }
    // kernel edge shapes (r11 native GopherRepetition): multi-byte
    // BMP chars (numChars vs bytes), a one-token doc (no grams of any
    // n), and a same-token flood (every 2-gram identical)
    val multiByte = (base.take(40) ++
      (1 to 4).flatMap(k => Seq("的是", "不了在", s"uniq$k"))).mkString(" ")
    val flood = (Seq("the", "a") ++ Array.fill(58)("bb")).mkString(" ")
    val docs: Seq[(Long, String)] =
      Seq((1L, good), (2L, short), (3L, longWords), (4L, symbols),
        (5L, nonAlpha), (6L, noStops)) ++
      dupDocs.zipWithIndex.map { case ((_, t), i) => (10L + i, t) } ++
      topDocs.zipWithIndex.map { case ((_, t), i) => (20L + i, t) } ++
      Seq((30L, multiByte), (31L, "solo"), (32L, flood))
    val out = operators.TextAnalysis.qualityGopher(
        docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("pass_gopher") == 1L, s"${out(1L)}")
    (2L to 6L).foreach(i =>
      assert(out(i).getAs[Long]("pass_gopher") == 0L, s"doc $i: ${out(i)}"))
    // integer surrogates of the legacy rules
    assert(out(1L).getAs[Long]("mwl_x100") == 571L)
    assert(out(4L).getAs[Long]("symbol_bp") == 4833L)
    assert(out(5L).getAs[Long]("alpha_bp") == 3500L)
    assert(out(6L).getAs[Long]("stop_hits") == 0L)
    // brute-force mirror of the set-wise repetition definitions
    def mirror(text: String): Map[String, Long] = {
      val toks = text.split(" ")
      val lt = text.length.toLong
      def grams(n: Int): Seq[String] =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      (operators.TextAnalysis.GopherDupBp.map { case (n, _) =>
        s"dup${n}_bp" -> grams(n).groupBy(identity).values
          .filter(_.size >= 2)
          .map(g => (g.size - 1).toLong * g.head.length).sum * 10000L / lt
      } ++ operators.TextAnalysis.GopherTopBp.map { case (n, _) =>
        val byG = grams(n).groupBy(identity)
        s"top${n}_bp" -> (if (byG.isEmpty) 0L
          else byG.values.map(g => g.size.toLong * g.head.length).max
            * 10000L / lt)
      }).toMap
    }
    val byId = docs.toMap
    (Seq(1L, 30L, 31L, 32L) ++ dupDocs.indices.map(10L + _) ++
      topDocs.indices.map(20L + _))
      .foreach { id =>
        mirror(byId(id)).foreach { case (c, v) =>
          assert(out(id).getAs[Long](c) == v,
            s"doc $id col $c: got ${out(id).getAs[Long](c)}, mirror $v")
        }
      }
    dupDocs.zipWithIndex.foreach { case ((n, _), i) =>
      val ceil = operators.TextAnalysis.GopherDupBp.toMap.apply(n)
      assert(out(10L + i).getAs[Long](s"dup${n}_bp") > ceil,
        s"dup$n doc does not trip its ceiling: ${out(10L + i)}")
      assert(out(10L + i).getAs[Long]("pass_gopher") == 0L)
    }
    topDocs.zipWithIndex.foreach { case ((n, _), i) =>
      val ceil = operators.TextAnalysis.GopherTopBp.toMap.apply(n)
      assert(out(20L + i).getAs[Long](s"top${n}_bp") > ceil,
        s"top$n doc does not trip its ceiling: ${out(20L + i)}")
      assert(out(20L + i).getAs[Long]("pass_gopher") == 0L)
    }
    // the distinct-word passing doc carries clean repetition signals
    assert(out(1L).getAs[Long]("dup5_bp") == 0L)
  }

  test("repetition kernels: 400 seeded random docs == brute force on every signal") {
    // fuzz the native kernels' machinery — token interning, rolling
    // polynomial keys incl. the drop-out term, open-addressed maps
    // under heavy collision load (8-token vocab → most grams repeat)
    // — against the same set-wise definitions the planted-doc spec
    // mirrors. BMP-only vocab so java String length == codepoints.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "bb", "ccc", "的是", "word", "x1", "yy2", "zzz33")
    val dupNs = operators.TextAnalysis.GopherDupBp.map(_._1)
    val topNs = operators.TextAnalysis.GopherTopBp.map(_._1)
    (1 to 400).foreach { _ =>
      val m = rnd.nextInt(81)
      val toks = Vector.fill(m)(vocab(rnd.nextInt(vocab.length)))
      val text = toks.mkString(" ")
      val lt = math.max(text.length.toLong, 1L)
      val arr = new GenericArrayData(
        toks.map(UTF8String.fromString).toArray[Any])
      def grams(n: Int): Seq[String] =
        if (m < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
      val rep = graft.plans.GopherRepetition
        .signals(arr, text.length.toLong).toLongArray()
      dupNs.zipWithIndex.foreach { case (n, i) =>
        val want = grams(n).groupBy(identity).values.filter(_.size >= 2)
          .map(g => (g.size - 1).toLong * g.head.length).sum * 10000L / lt
        assert(rep(i) == want, s"dup$n: got ${rep(i)}, want $want: '$text'")
      }
      topNs.zipWithIndex.foreach { case (n, i) =>
        val byG = grams(n).groupBy(identity)
        val want = (if (byG.isEmpty) 0L
          else byG.values.map(g => g.size.toLong * g.head.length).max) *
          10000L / lt
        assert(rep(dupNs.length + i) == want,
          s"top$n: got ${rep(dupNs.length + i)}, want $want: '$text'")
      }
      val tg = graft.plans.GopherRepetition.topGramCount(arr, 2).toLongArray()
      val bg = grams(2)
      val wantTop = if (bg.isEmpty) 0L
        else bg.groupBy(identity).values.map(_.size.toLong).max
      assert(tg(0) == wantTop && tg(1) == bg.length.toLong,
        s"topGramCount: got ${tg.toSeq}, want ($wantTop, ${bg.length}): '$text'")
    }
  }

  test("ingest_bloom: no false negatives, bounded survivors, == exact gate, store-fed") {
    // history: 40 docs; shard: 60 fresh + 5 planted exact copies
    val hist = (0L until 40L).map(i => (i, s"history doc $i body ${i * 7}"))
    val dupOf = Seq(3L, 11L, 19L, 27L, 35L)
    val shard = (100L until 160L).map(i => (i, s"fresh doc $i payload ${i * 13}")) ++
      dupOf.zipWithIndex.map { case (h, j) => (200L + j, s"history doc $h body ${h * 7}") }
    val d = (hist ++ shard).toDF("doc_id", "text")
    val out = operators.Dedup.bloomGateFrom(
      d.filter($"doc_id" >= 100L),
      d.filter($"doc_id" < 100L).select(md5($"text").as("th"))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // bloom guarantee: every true dup passes the sketch AND confirms
    dupOf.indices.foreach { j =>
      assert(out(200L + j) == ((1L, 1L)), s"dup ${200L + j}: ${out(200L + j)}")
    }
    // no fresh doc is ever CONFIRMED a dup (fp dies at the exact join)
    (100L until 160L).foreach(i => assert(out(i)._2 == 0L))
    // the pre-gate prunes: survivors ≈ dups (+ a vanishing fp trickle
    // at the default 1M-item sizing over 40 inserted hashes)
    val survivors = out.values.count(_._1 == 1L)
    assert(survivors >= 5 && survivors <= 10, s"survivors=$survivors")

    // verdict == dedup_incremental's exact flag, row-for-row, and the
    // store-fed path (reloaded sink_fingerprints content frame) agrees
    val store = java.nio.file.Files.createTempDirectory("bloomstore").toString
    sources.Fingerprints.write(d.filter($"doc_id" < 100L), store, nShards = 2)
    val fromStore = operators.Dedup.bloomGateFrom(
      d.filter($"doc_id" >= 100L),
      sources.Fingerprints.readContent(spark, store)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exact = operators.Dedup.incrementalDedup(d, 100L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("is_exact_dup")).toMap
    out.foreach { case (id, (_, dup)) =>
      assert(exact(id) == dup, s"doc $id: bloom verdict $dup != exact ${exact(id)}")
      assert(fromStore(id) == dup, s"doc $id: store-fed ${fromStore(id)} != $dup")
    }
  }

  test("ingest_bloom: confirm join probes only bloom survivors") {
    // the exact join's stream side must be the bloom-filtered frame,
    // not the full shard: with AQE off, find the join and check its
    // probe subtree carries the bloom_pass filter
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("ingest_bloom").queryExecution.executedPlan
      val gatedJoins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
            if j.children.exists(_.toString.contains("might_contain")) => j
      }
      assert(gatedJoins.nonEmpty,
        s"no join probes the bloom-survivor frame:\n$plan")
      // bonus inference Catalyst makes from the equi-join constraint:
      // the bloom predicate propagates to the HISTORY side too, so the
      // store scan itself is pre-filtered by the sketch
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.toString.contains("might_contain") => s
      }.nonEmpty, s"bloom predicate not pushed into a scan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q32_khop_reach: equals an independent BFS over the same edges") {
    val edges = operators.Graph.transitionEdges(Tables.events(spark, sfDir))
      .select($"src", $"dst").collect()
      .map(r => r.getInt(0) -> r.getInt(1))
    val adj = edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    val seeds = edges.map(_._1).distinct.sorted.take(operators.Graph.KhopSeeds)
    val want = (for {
      seed <- seeds
      d0 = Map(seed -> 0L)
      d1 = adj.getOrElse(seed, Set.empty)
        .map(_ -> 1L).toMap.filterNot { case (n, _) => d0.contains(n) } ++ d0
      d2 = d1.keys.filter(d1(_) == 1L)
        .flatMap(n => adj.getOrElse(n, Set.empty)).map(_ -> 2L).toMap
        .filterNot { case (n, _) => d1.contains(n) } ++ d1
      (node, hops) <- d2
    } yield (seed, node) -> hops).toMap
    val got = run("q32_khop_reach").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == want,
      s"diff=${(got.toSet diff want.toSet).take(3)} / ${(want.toSet diff got.toSet).take(3)}")
  }

  test("ngram_lm: no Exchange carries the corpus text") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    // train + score over the corpus moves only skinny (doc_id, w1, w2)
    // and count rows; the text column itself must never cross an
    // exchange. AQE off so executedPlan materializes the exchanges.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("ngram_lm").queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, s"expected skinny count shuffles:\n$plan")
      (shuffles: Seq[org.apache.spark.sql.execution.SparkPlan]).foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"an exchange carries the corpus text:\n$e")
      }
      plan.collect { case e: BroadcastExchangeExec => e }.foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"a broadcast carries the corpus text:\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("skipgram_pairs: hand-computed symmetric window counts; narrow build") {
    // "a b c a", window ±4, weight 12/d. Forward pairs (center, ctx, d):
    // (a,b,1) (a,c,2) (a,a,3) (b,c,1) (b,a,2) (c,a,1); symmetric table
    // adds every reverse. Counts: (a,b)=(b,a)=2 w18 (d∈{1,2}),
    // (a,c)=(c,a)=2 w18, (b,c)=(c,b)=1 w12, (a,a)=2 w8 (d=3 twice).
    val fixture = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val m = operators.LangModel.skipgramPairs(fixture, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("weight12"))).toMap
    assert(m(("a", "b")) == ((2L, 18L)) && m(("b", "a")) == ((2L, 18L)))
    assert(m(("a", "c")) == ((2L, 18L)) && m(("c", "a")) == ((2L, 18L)))
    assert(m(("b", "c")) == ((1L, 12L)) && m(("c", "b")) == ((1L, 12L)))
    assert(m(("a", "a")) == ((2L, 8L)), s"${m(("a", "a"))}")
    assert(m.size == 7)
    // the matrix is symmetric by construction on real data too
    val real = run("skipgram_pairs").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("weight12"))).toMap
    real.foreach { case ((a, b), v) =>
      assert(real((b, a)) == v, s"asymmetric at ($a, $b)")
    }
    // narrow build: the ONLY shuffle is the skinny pair count — no
    // per-doc window, no positional self-join, text never moves
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("skipgram_pairs").queryExecution.executedPlan
      assert(!plan.toString.contains("WindowExec"), plan.toString)
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.size == 1, s"expected exactly the pair-count shuffle:\n$plan")
      assert(!shuffles.head.output.exists(_.name == "text"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("sample_stratified: exactly k per stratum, hash-ordered, heap plan") {
    // small stratum keeps everything; big stratum keeps exactly StratK,
    // and the kept set is the k smallest by the portable Lehmer hash
    graft.plans.GraftFunctions.register(spark)
    val m = graft.operators.Sampling.MixMod
    val mul = graft.operators.Sampling.MixMul
    val k = graft.operators.Sampling.StratK
    val docs = ((1L to 200L).map(i => (i, "big")) ++
      (1001L to 1005L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = graft.operators.Sampling.sampleStratified(docs).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("small").length == 5 && bySrc("big").length == k)
    val expectBig = (1L to 200L).map(i => (i * mul % m, i)).sorted.take(k)
      .map(_._2).toSet
    assert(bySrc("big").map(_.getAs[Long]("doc_id")).toSet == expectBig)
    // ranks are contiguous 1..k in hash order
    assert(bySrc("big").map(_.getAs[Long]("rk")).sorted.sameElements(1L to k))
    // plan: the custom bounded-heap operator, not a rank window
    // (AQE off so the executed tree is not an AdaptiveSparkPlan wrapper)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("sample_stratified").queryExecution.executedPlan
      assert(plan.collect {
        case t: graft.plans.TopKPerKeyFinalExec => t }.nonEmpty,
        s"expected TopKPerKey heap exec:\n$plan")
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
        s"a rank window over full strata is the rejected plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("profile_stats: nulls, exact NDV, native-order min/max; sort-free plan") {
    // planted fixture replayed through the same aggregation shape the
    // operator uses on lineitem (schema matters, not the table): nulls
    // counted, NDV exact, min/max NUMERIC (9 < 10 — a lexicographic
    // min would say "10" < "9")
    val d = Seq[(java.lang.Long, String)](
      (9L, "a"), (10L, "a"), (10L, "b"), (null, "b"))
      .toDF("k", "s")
    val row = d.agg(count(lit(1)).as("n_rows"), count($"k").as("nn"),
        countDistinct($"k").as("nd"),
        min($"k").cast("string").as("mn"), max($"k").cast("string").as("mx"))
      .head
    assert(row.getLong(0) == 4 && row.getLong(1) == 3 && row.getLong(2) == 2)
    assert(row.getString(3) == "9" && row.getString(4) == "10")
    // the real operator: two bounded passes (scalar agg + melted NDV)
    // and NO sort anywhere — the rejected multi-countDistinct shape
    // sorts the Expand-multiplied table (15 s vs 1 s at sf0.1).
    // AQE off so executedPlan is the materialized tree, not a wrapper.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("profile_stats").queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(scans.size == 2, s"scalar pass + NDV pass, no more:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        s"nothing in the profile needs a sort:\n$plan")
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.ExpandExec => e }.isEmpty,
        s"the Expand multi-NDV lowering is the rejected plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val out = run("profile_stats").collect()
    assert(out.length == 7 && out.forall(_.getAs[Long]("n_rows") > 0))
  }

  test("profile_sketch: HLL NDV within 5% of exact; ONE scan, no melt shuffle") {
    // same profile, NDV via mergeable HLL at lgK=14 (rel err ~0.8%):
    // every column's estimate must land within 5% of the exact pass,
    // and nulls/min/max must agree exactly (they share the formulas)
    val exact = run("profile_stats").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val approx = run("profile_sketch").collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val e = exact(r.getAs[String]("col_name"))
      val (nd, ed) = (r.getAs[Long]("approx_distinct"), e.getAs[Long]("n_distinct"))
      assert(math.abs(nd - ed).toDouble <= math.max(1.0, 0.05 * ed),
        s"${r.getAs[String]("col_name")}: approx $nd vs exact $ed")
      assert(r.getAs[Long]("n_null") == e.getAs[Long]("n_null"))
      assert(r.getAs[String]("min_v") == e.getAs[String]("min_v") &&
        r.getAs[String]("max_v") == e.getAs[String]("max_v"))
    }
    // the at-scale contract: ONE table scan (profile_stats needs two),
    // no melted per-value shuffle, no Expand, no sort — the only
    // exchange carries one constant-size partial-buffer row per task
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("profile_sketch").queryExecution.executedPlan
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.size == 1,
        s"sketch profile must be one pass:\n$plan")
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.ExpandExec => e }.isEmpty &&
        plan.collect {
          case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        s"Expand/Sort crept into the sketch profile:\n$plan")
      // the output stack() is a Generate over the ONE aggregate row —
      // fine; the rejected melted shape is a Generate over scan rows
      // (no aggregate between it and the file scan)
      plan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g }.foreach { g =>
        assert(g.child.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
          case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
        }.nonEmpty,
          s"a Generate melts raw scan rows — the rejected plan:\n$plan")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("mine_hardneg: negatives exclude the positive, ranked by the shared BM25 kernel") {
    import operators.Search
    val out = SparkEntry.queries("mine_hardneg")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neg_id"),
        r.getAs[Long]("score"), r.getAs[Long]("rk")))
    assert(out.nonEmpty)
    // the positive never appears among its own negatives; ranks are
    // 1..k dense per query, scores non-increasing within a query
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(q % 97 == 0, s"query $q outside the slice")
      assert(rows.forall(_._2 != q), s"query $q mined itself")
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to rows.length).toSeq, s"$q")
      assert(sorted.map(_._3).toSeq.reverse.sorted.reverse ==
        sorted.map(_._3).toSeq, s"$q scores not non-increasing")
      assert(rows.length <= Search.HnK)
    }
    // hard means HARD: a mined negative shares query terms with the
    // positive by construction (n_terms >= 1) — the lexical confusable
    // a random negative would not be
    val nt = SparkEntry.queries("mine_hardneg")(spark, sfDir).collect()
      .map(_.getAs[Long]("n_terms"))
    assert(nt.forall(_ >= 1L))
  }

  test("mine_hardneg: corpus-growing mining frames ride the counted broadcast guard") {
    import operators.Search
    graft.plans.GraftFunctions.register(spark)
    // queries are the %97 slice (docs 0, 97, 194); the rest are pool
    // docs sharing their terms, so every query mines real negatives
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (97L, "epsilon zeta eta theta"),
      (194L, "iota kappa lambda mu"),
      (1L, "alpha beta gamma nu"),
      (2L, "epsilon zeta eta xi"),
      (3L, "iota kappa lambda omicron"),
      (4L, "alpha epsilon iota pi"),
      (5L, "beta zeta kappa rho")
    ).toDF("doc_id", "text")
    // default bound: the KB-scale frames pass the measured count →
    // broadcast fan-out joins
    val small = Search.hardNegatives(docs)
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastHashJoin"), smallPlan)
    // bound forced to 0: every mining frame counts as oversized — the
    // token joins must NOT pin the query slice's vocabulary / dfs /
    // qterms via a broadcast (at the brief's 100 TB those are ~1e8
    // tokens and ~1e9 rows; an unconditional broadcast OOMs)
    val guarded = Search.hardNegatives(docs, broadcastMaxRows = 0L)
    val guardedPlan = guarded.queryExecution.executedPlan.toString
    assert(!guardedPlan.contains("BroadcastHashJoin"),
      s"mining frames above the bound must shuffle-join, not broadcast:\n$guardedPlan")
    // the guard changes join strategy only — results are identical
    def key(r: org.apache.spark.sql.Row) = r.toString
    assert(guarded.collect().map(key).sorted.toSeq ==
      small.collect().map(key).sorted.toSeq,
      "guarded plan changed results")
    // the inline shared-pass shape (one candidate-vocab tf frame
    // feeding both derivation and scoring — r16) must equal the
    // production derive∘score composition row for row: same integer
    // kernel, same deterministic tie orders, different pass structure
    val composed = Search.hardNegativesWith(docs, Search.deriveQueryTerms(docs))
    assert(small.collect().map(key).sorted.toSeq ==
      composed.collect().map(key).sorted.toSeq,
      "inline shared-pass result drifted from derive∘score")
  }

  test("code_detect: planted code trips each gate arm; prose stays clean") {
    import operators.TextAnalysis
    val code =
      "import os\ndef f(x):\n  return g(x) + 1\nclass A:\n  def h(self):\n    return 2"
    // long prose body keeps sym_ppm below the 3 % gate (the newline/
    // tab chars themselves count as symbols), so only the indent arm
    // can fire
    val indentOnly =
      "line one\n  hang two\n  hang three\n\thang four " +
        (1 to 30).map(i => s"prose$i").mkString(" ")
    val symbols = "x=1;y=2;z={a:[1,2]};w=(x<y)>z;"
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    // capitalized, punctuated prose — the false-positive shape the
    // pre-r17 symbol class [^a-z0-9 ] misclassified (uppercase and
    // sentence punctuation counted as code symbols)
    val caps = "Hello, World. This is a sentence. Isn't English prose " +
      "full of Capitals, commas - and question marks? Yes!"
    val out = TextAnalysis.codeDetect(Seq(
        (1L, code), (2L, indentOnly), (3L, symbols), (4L, prose),
        (5L, caps))
      .toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: kw-arm — def×2 + return×2 + import + class = 6 hits,
    // ()s and :s give punct ≥ 2
    assert(out(1L).getAs[Long]("kw_hits") == 6L, out(1L).toString)
    assert(out(1L).getAs[Long]("code_punct") >= 2L)
    assert(out(1L).getAs[Long]("is_code") == 1L)
    // doc 2: indent-arm ALONE — exactly 3 newline-indented lines,
    // zero keywords, zero code punctuation, symbol density under the
    // gate (asserted, so no other arm can be carrying the verdict)
    assert(out(2L).getAs[Long]("indent_lines") == 3L, out(2L).toString)
    assert(out(2L).getAs[Long]("kw_hits") == 0L)
    assert(out(2L).getAs[Long]("code_punct") == 0L)
    assert(out(2L).getAs[Long]("sym_ppm") < 30000L, out(2L).toString)
    assert(out(2L).getAs[Long]("is_code") == 1L)
    // doc 3: symbol-density arm — 12 symbol chars hand-counted over 30
    // chars = 400000 ppm ≫ the 3 % gate (the ; : , chars no longer
    // count as symbols; = { } [ ] ( ) < > still do)
    assert(out(3L).getAs[Long]("sym_ppm") > 30000L, out(3L).toString)
    assert(out(3L).getAs[Long]("is_code") == 1L)
    // doc 4: prose — every feature zero, gate closed
    assert(out(4L).getAs[Long]("sym_ppm") == 0L)
    assert(out(4L).getAs[Long]("kw_hits") == 0L)
    assert(out(4L).getAs[Long]("is_code") == 0L)
    // doc 5: capitalized punctuated prose — sym_ppm must read ZERO
    // (uppercase + . , ! ? ' - are prose, not symbols) and the gate
    // must stay closed
    assert(out(5L).getAs[Long]("sym_ppm") == 0L, out(5L).toString)
    assert(out(5L).getAs[Long]("is_code") == 0L)
    // corpus framing: the synthetic 31-word prose vocabulary must read
    // all-clean (the oracle validates features; positives live here)
    val corpus = SparkEntry.queries("code_detect")(spark, sfDir)
    assert(corpus.filter($"is_code" =!= 0L).count() == 0)
  }

  test("code_metrics: planted files — line stats exact, every gate arm fires once") {
    import operators.TextAnalysis
    // doc 1: clean two-line function — every feature hand-checked
    val clean = "def f(x):\n  return x + 1"
    // doc 2: one 1200-char line (minified bundle shape)
    val longLine = "x" * 1200
    // doc 3: four 16-hex runs (UUID/hash dump) — trips hex_runs < 4
    val hexy = (1 to 4).map(_ => "deadbeef00112233").mkString(" ")
    // doc 4: an embedded 64-char base64 blob inside otherwise-fine code
    val b64 = "k = '" + ("QUJD" * 16) + "'"
    // doc 5: all-punctuation line — alnum fraction 0
    val punct = "((((((((((()))))))))))"
    val out = TextAnalysis.codeMetrics(Seq(
      (1L, clean), (2L, longLine), (3L, hexy), (4L, b64), (5L, punct))
      .toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    // clean: 2 lines, max 14 ("  return x + 1"), 23 payload chars →
    // avg_line_x100 = 2300 // 2 = 1150; alnum 13 of 24 chars
    assert(out(1L).getAs[Long]("n_lines") == 2L)
    assert(out(1L).getAs[Long]("max_line") == 14L, out(1L).toString)
    assert(out(1L).getAs[Long]("avg_line_x100") ==
      (clean.length - 1L) * 100L / 2L)
    assert(out(1L).getAs[Long]("alnum_ppm") ==
      clean.count(_.isLetterOrDigit) * 1000000L / clean.length)
    assert(out(1L).getAs[Long]("keep_code") == 1L)
    // each dirty doc fails through exactly the planted arm
    assert(out(2L).getAs[Long]("max_line") == 1200L &&
      out(2L).getAs[Long]("keep_code") == 0L)
    assert(out(3L).getAs[Long]("hex_runs") == 4L &&
      out(3L).getAs[Long]("keep_code") == 0L)
    assert(out(4L).getAs[Long]("b64_blobs") == 1L &&
      out(4L).getAs[Long]("keep_code") == 0L)
    assert(out(5L).getAs[Long]("alnum_ppm") == 0L &&
      out(5L).getAs[Long]("keep_code") == 0L)
    // corpus framing: single-line prose docs — n_lines 1 everywhere,
    // max_line = doc length, and the line gates pass (prose fails
    // nothing here; the gate exists for code routed by code_detect)
    val corpus = SparkEntry.queries("code_metrics")(spark, sfDir)
    assert(corpus.filter($"n_lines" =!= 1L).count() == 0)
    assert(corpus.filter($"max_line" > 1000L).count() == 0)
  }

  test("text_nfc: combining sequences compose, composed text passes untouched, normalization never grows") {
    import operators.TextAnalysis
    val decomposed = "caf" + "é"          // e + combining acute
    val composed = "café"                   // precomposed é
    val hangul = "가"                  // composes to U+AC00 가
    val out = TextAnalysis.textNfc(Seq(
      (1L, decomposed), (2L, composed), (3L, "plain ascii"),
      (4L, hangul)).toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out(1L) == (5L, 4L, 0L))
    assert(out(2L) == (4L, 4L, 1L))
    assert(out(3L) == (11L, 11L, 1L))
    assert(out(4L) == (2L, 1L, 0L))
    // the kernel itself: equality with the JDK reference and
    // idempotence (NFC of NFC is a fixed point)
    val nfc = graft.plans.NfcNormalize.nfc(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposed))
      .toString
    assert(nfc == composed)
    assert(java.text.Normalizer.isNormalized(nfc,
      java.text.Normalizer.Form.NFC))
    // corpus framing: ASCII is trivially NFC everywhere, so the
    // oracle proves engine equality and the plants prove semantics
    val corpus = SparkEntry.queries("text_nfc")(spark, sfDir).collect()
    corpus.foreach { r =>
      assert(r.getAs[Long]("is_nfc") == 1L)
      assert(r.getAs[Long]("raw_chars") == r.getAs[Long]("nfc_chars"))
    }
  }

  test("winnow_fingerprint: Scala replay matches, shared substrings share fingerprints, density near 2/(W+1)") {
    import operators.TextAnalysis
    val W = TextAnalysis.WinnowW
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the paper's algorithm in plain Scala — the third engine
    def winnow(text: String): (Long, Set[String], String) = {
      val toks = text.split(" ", -1)
      val nGrams = math.max(toks.length - 4, 0) + 1
      val keys = (0 until nGrams).map { i =>
        val h = md5hex(toks.slice(i, i + 4).mkString(" "))
        (h + "-" + "%09d".format(999999999L - i), h)
      }
      val starts = 0 to math.max(nGrams - W, 0)
      val sel = starts.map(p =>
        keys.slice(p, p + W).minBy(_._1)).toSet
      val digest = md5hex(sel.map(_._2).toSeq.sorted.mkString(""))
      (nGrams.toLong, sel.map(_._2), digest)
    }
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ")
    val a = "pre1 pre2 pre3 " + shared + " tailA1 tailA2"
    val b = "other1 other2 other3 other4 " + shared + " tailB"
    val out = TextAnalysis.winnowFingerprint(
      Seq((1L, a), (2L, b), (3L, "tiny doc")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    Seq(1L -> a, 2L -> b, 3L -> "tiny doc").foreach { case (id, t) =>
      val (ng, sel, dig) = winnow(t)
      assert(out(id)._1 == ng, s"doc $id n_grams")
      assert(out(id)._2 == sel.size.toLong, s"doc $id n_selected")
      assert(out(id)._4 == dig, s"doc $id digest")
    }
    // the local-containment guarantee: a shared run of >= W+k-1 = 11
    // tokens forces at least one shared selected fingerprint
    assert((winnow(a)._2 intersect winnow(b)._2).nonEmpty)
    // a sub-window doc still selects (the single whole-doc window)
    assert(out(3L)._2 == 1L)
  }

  test("winnow_pairs: shared runs pair up, exact copies fold into mass, the hot cap silences boilerplate floods") {
    import operators.TextAnalysis
    val shared = (1 to 30).map(i => s"shared$i").mkString(" ")
    val a = "preA1 preA2 " + shared + " tailA"
    val b = "preB1 preB2 preB3 preB4 " + shared
    val aCopy = a // byte-identical: folds into A's group, never pairs
    val lone = (1 to 20).map(i => s"lone$i").mkString(" ")
    val out = TextAnalysis.winnowPairs(Seq(
      (1L, a), (2L, b), (3L, aCopy), (4L, lone)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // exactly one candidate pair: the two distinct texts sharing the
    // 30-token run; the copy rides as group mass ma=2, not a row
    assert(out.keySet == Set((1L, 2L)))
    val (nShared, ma, mb) = out((1L, 2L))
    assert(nShared >= TextAnalysis.PairMinShared)
    assert(ma == 2L && mb == 1L)
    // boilerplate flood: 70 distinct docs all sharing the same long
    // run — every shared fingerprint has df = 70 > HotFpCap, so the
    // join drops them all and NO quadratic pair set forms (the
    // substring/exact passes own that case; this op's job is bounded
    // candidate generation)
    val flood = (1 to 70).map(i =>
      (100L + i, shared + s" uniq$i")).toDF("doc_id", "text")
    assert(TextAnalysis.winnowPairs(flood).count() == 0L)
  }

  test("winnow_pairs corpus invariants: ordered rep pairs, threshold respected, masses positive") {
    val rows = SparkEntry.queries("winnow_pairs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (aId, bId, n, ma, mb) =>
      assert(aId < bId)
      assert(n >= graft.operators.TextAnalysis.PairMinShared)
      assert(ma >= 1L && mb >= 1L)
    }
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length)
  }

  test("winnow_fingerprint corpus invariants: density tracks the 2/(W+1) expectation, duplicates collide") {
    val rows = SparkEntry.queries("winnow_fingerprint")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, ng, sel, _, _) =>
      assert(sel >= 1L && sel <= ng, s"doc $id")
    }
    // corpus-mean selected density near the paper's 2/(W+1) = 222222
    // ppm (long-doc regime; the bound is loose for the mixed corpus)
    val dens = rows.map(r => r._3.toDouble / r._2).sum / rows.length
    assert(dens > 0.15 && dens < 0.34, s"mean density $dens")
    // byte-identical docs fingerprint identically (the dedup use)
    val texts = graft.Tables(spark, sfDir, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val byText = rows.groupBy(r => texts(r._1))
    byText.values.filter(_.length > 1).take(5).foreach { grp =>
      assert(grp.map(_._5).distinct.length == 1, "dup docs diverged")
    }
  }

  test("data_card_kanon: small cells fold per lang, totals stay exact") {
    import operators.TextAnalysis
    val card = SparkEntry.queries("data_card")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val safe = SparkEntry.queries("data_card_kanon")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source_out")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_cells"), r.getAs[Long]("suppressed"))).toMap
    // no published cell below the floor; suppression actually fired
    safe.foreach { case ((lang, src), (nd, _, nc, sup)) =>
      if (sup == 0L)
        assert(nd >= TextAnalysis.KanonMinCell && nc == 1L, s"$lang/$src")
      else assert(src == "(suppressed)" && nc >= 1L)
    }
    assert(safe.exists(_._2._4 == 1L), "fixture must suppress some cells")
    assert(safe.exists(_._2._4 == 0L), "fixture must publish some cells")
    // published cells are the card's own cells, verbatim
    safe.filter(_._2._4 == 0L).foreach { case ((lang, src), (nd, nt, _, _)) =>
      assert(card((lang, src)) == (nd, nt), s"$lang/$src")
    }
    // per-lang totals are EXACT: suppression relocates counts, never
    // drops them
    card.groupBy(_._1._1).foreach { case (lang, cells) =>
      val total = cells.values.map(_._1).sum
      val safeTotal = safe.collect {
        case ((l, _), (nd, _, _, _)) if l == lang => nd }.sum
      assert(safeTotal == total, s"$lang: $safeTotal != $total")
    }
  }

  test("dp_card: release equals the mechanism replayed exactly; noise bounded, fires, never negative") {
    import operators.{Sampling, TextAnalysis}
    // the true clipped cells, recomputed independently of the op
    val truth = graft.Tables(spark, sfDir, "documents")
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("nd"),
        sum(least(size(split($"text", " ")).cast("long"),
          lit(TextAnalysis.TokClip))).as("ct"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // the ladder replayed in plain Scala — the test is a third engine
    def z(p48: Long): Long = TextAnalysis.GeomLadder48
      .collectFirst { case (b, n) if p48 < b => n.toLong }.getOrElse(4L)
    def draw(seed: Long): Long =
      (seed * Sampling.MixMul % Sampling.MixMod) * 48 / Sampling.MixMod
    val expected = truth.toSeq.sortBy(_._1).zipWithIndex.map {
      case (((lang, src), (nd, ct)), i) =>
        val rid = i + 1L
        (lang, src) -> (
          math.max(nd + z(draw(rid * 2 - 1)), 0L),
          math.max(ct + z(draw(rid * 2)) * TextAnalysis.TokClip, 0L))
    }.toMap
    val out = SparkEntry.queries("dp_card")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == expected)
    // release properties: bounded deviation (the ±4 truncated ladder),
    // noise actually fires, nothing negative
    assert(out.values.forall { case (d, t) => d >= 0L && t >= 0L })
    out.foreach { case (k, (d, t)) =>
      val (nd, ct) = truth(k)
      assert(math.abs(d - nd) <= 4L, s"$k docs")
      assert(math.abs(t - ct) <= 4L * TextAnalysis.TokClip, s"$k toks")
    }
    assert(out.exists { case (k, (d, _)) => d != truth(k)._1 },
      "doc noise never fired across the whole card")
    assert(out.exists { case (k, (_, t)) => t != truth(k)._2 },
      "token noise never fired across the whole card")
  }

  test("blocklist_filter: occurrence and distinct-term counts, keep flips on any hit") {
    val out = SparkEntry.queries("blocklist_filter")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocked"), r.getAs[Long]("n_blocked_terms"),
          r.getAs[Long]("keep"))).toMap
    val texts = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == texts.size)
    texts.foreach { case (id, txt) =>
      val toks = txt.split(" ", -1)
      val hits = toks.count(operators.TextAnalysis.Blocklist.contains)
      val terms = toks.filter(operators.TextAnalysis.Blocklist.contains)
        .distinct.length
      assert(out(id) == (hits.toLong, terms.toLong,
        if (hits == 0) 1L else 0L), s"doc $id")
    }
    // the fixture list is non-degenerate: some docs flag, most keep
    assert(out.values.exists(_._3 == 0L) && out.values.exists(_._3 == 1L))
  }

  test("snapshot_diff: planted add/remove/carry, content-keyed across doc ids") {
    import spark.implicits._
    // snapshot A = even ids, B = odd ids. Within source sX:
    //   "carried" appears in BOTH snapshots under different ids;
    //   "gone"    only in A (removed); "new" only in B (added);
    //   "dupe"    TWICE in A (must count once — distinct within side)
    val d = Seq(
      (0L, "carried text", "sX"), (1L, "carried text", "sX"),
      (2L, "gone text", "sX"), (4L, "dupe text", "sX"),
      (6L, "dupe text", "sX"), (3L, "new text", "sX"),
      (10L, "solo", "sY"), (11L, "solo", "sY"))
      .toDF("doc_id", "text", "source")
    val out = operators.Profile.snapshotDiff(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_added"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_carried"), r.getAs[Long]("churn_ppm"))).toMap
    // sX: A = {carried, gone, dupe}, B = {carried, new}
    assert(out("sX") == (3L, 2L, 1L, 2L, 1L, 3L * 1000000L / 5L))
    // sY: one content carried across the boundary → zero churn
    assert(out("sY") == (1L, 1L, 0L, 0L, 1L, 0L))
  }

  test("snapshot_diff driver query: per-source identities hold on the corpus") {
    val out = SparkEntry.queries("snapshot_diff")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val (add, rem, car) = (r.getAs[Long]("n_added"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_carried"))
      assert(na == rem + car && nb == add + car,
        s"side identities broken: $r")
      assert(r.getAs[Long]("churn_ppm") ==
        (add + rem) * 1000000L / (na + nb))
    }
  }

  test("profile_drift: planted composition shift lands exact ppm deltas and signed shift bits") {
    // snapshot A (even ids) vs B (odd ids): "web" holds 3/4 of A but
    // only 1/4 of B, "books" mirrors it — counts chosen so the ppm
    // divisions are exact and the shift bits are hand-derivable
    val a = (0 until 6).map(i => (2L * i, "web")) ++      // 6 even web
      (6 until 8).map(i => (2L * i, "books"))             // 2 even books
    val b = (0 until 2).map(i => (2L * i + 1, "web")) ++  // 2 odd web
      (2 until 8).map(i => (2L * i + 1, "books"))         // 6 odd books
    val d = (a ++ b).toDF("doc_id", "source")
    val out = operators.Profile.profileDrift(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val web = out("web")
    assert(web.getAs[Long]("cnt_a") == 6L && web.getAs[Long]("cnt_b") == 2L)
    assert(web.getAs[Long]("share_a_ppm") == 750000L &&
      web.getAs[Long]("share_b_ppm") == 250000L)
    assert(web.getAs[Long]("delta_ppm") == 500000L)
    // floor(log2(750001·2^20 / 250001)) − 20 = floor(log2(~3.0)) = 1
    assert(web.getAs[Long]("shift_bits") == 1L, s"$web")
    val books = out("books")
    assert(books.getAs[Long]("delta_ppm") == 500000L)
    // shrinking share → negative bits
    assert(books.getAs[Long]("shift_bits") == -2L, s"$books")
  }

  test("search_bm25: hand-computed scores; query-pruned, heap-ranked plan") {
    // fixture: N=4 docs, T=12 tokens; query terms dup (df 2) and hash
    // (df 2); vector absent. idf_bits(df=2) = ilog2(10·65536 DIV 5)−16
    //   = bitlen(131072)−1−16 = 1.
    // contrib = (1·44·12·tf·1000) DIV (20·12·tf + 72 + 18·dl·4):
    //   d1 dup tf=2 dl=3: 1056000 DIV 768 = 1375
    //   d3 hash tf=1 dl=4: 528000 DIV 600 = 880
    //   d4 dup/hash tf=1 dl=2: 528000 DIV 456 = 1157 each → 2314
    val fixture = Seq(
      (1L, "dup dup cat"), (2L, "cat dog bird"),
      (3L, "hash cat cat cat"), (4L, "dup hash")).toDF("doc_id", "text")
    val got = operators.Search.bm25TopK(fixture).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("n_terms"), r.getAs[Long]("rk")))
    assert(got.toSeq == Seq((4L, 2314L, 2L, 1L), (1L, 1375L, 1L, 2L),
      (3L, 880L, 1L, 3L)), s"got ${got.toSeq}")
    // plan: global top-K through TakeOrdered heaps, rank window only
    // above the K-row limit, and neither the text nor the token arrays
    // ever cross an exchange (the explode is pruned to query terms
    // before the skinny (doc, term) shuffle)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("search_bm25").queryExecution.executedPlan
      assert(plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, s"top-K must be TakeOrdered heaps:\n$plan")
      plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.foreach { w =>
        assert(w.child.collectFirst {
          case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
          case l: org.apache.spark.sql.execution.GlobalLimitExec => l
        }.nonEmpty, s"a window runs over the un-limited frame:\n$w")
      }
      plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.foreach { e =>
        assert(!e.output.exists(a => a.name == "text" || a.name == "toks"),
          s"corpus text/tokens crossed an exchange:\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("search_phrase: adjacency hits with positions; ZERO-shuffle plan") {
    // d1: hits at 0-based positions 0 and 3 (overlap-free); d2: terms
    // present but never adjacent; d3: reversed order — no hit; d4:
    // shorter than the phrase (the sequence(1,0)/ANSI guard edge)
    val fixture = Seq(
      (1L, "hash join x hash join"), (2L, "hash x join"),
      (3L, "join hash"), (4L, "hash")).toDF("doc_id", "text")
    val got = operators.Search.phraseHits(fixture).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("first_pos")))
    assert(got.toSet == Set((1L, 2L, 0L)), s"got ${got.toSeq}")
    // phrase scoring is per-doc — the plan must be fully narrow: no
    // exchange of any kind, no explode, no join
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("search_phrase").queryExecution.executedPlan
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.isEmpty, s"phrase matching shuffled:\n$plan")
      assert(plan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.isEmpty, s"the explode+self-join shape is the rejected plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("span_corrupt: hand-traced Lehmer spans; lossless reconstruction corpus-wide") {
    graft.plans.GraftFunctions.register(spark)
    // for small (seed, i) the big-mod is identity, so span starts
    // satisfy 11·(seed+i+1) ≡ 0 (mod 20) ⇔ i ≡ 19 − seed (mod 20):
    // seed 0 over 25 tokens → one span at 19..21; seed 1 over 4
    // tokens → first start would be i=18 → untouched
    val toks25 = (0 until 25).map(i => s"t$i")
    val fixture = Seq(
      (0L, toks25.mkString(" ")),
      (1L, "a b c d")).toDF("doc_id", "text")
    val pairs = fixture
      .selectExpr("doc_id", "graft_span_corrupt(split(text, ' '), doc_id) AS ct")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getSeq[scala.collection.Seq[String]](1)(0).toSeq,
          r.getSeq[scala.collection.Seq[String]](1)(1).toSeq)).toMap
    assert(pairs(0L)._1 ==
      toks25.take(19) :+ "<extra_id_0>" :++ toks25.drop(22), s"${pairs(0L)._1}")
    assert(pairs(0L)._2 == Seq("<extra_id_0>", "t19", "t20", "t21"))
    assert(pairs(1L)._1 == Seq("a", "b", "c", "d") && pairs(1L)._2.isEmpty)
    // lossless inversion over the REAL corpus: splice each sentinel's
    // target span back into the input and recover every doc exactly
    def invert(input: collection.Seq[String],
        target: collection.Seq[String]): Seq[String] = {
      val spans = scala.collection.mutable.Map[String, Vector[String]]()
      var cur: String = null
      target.foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Vector() }
        else spans(cur) = spans(cur) :+ t
      }
      input.toSeq.flatMap(t =>
        if (t.startsWith("<extra_id_")) spans(t) else Seq(t))
    }
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks",
        "graft_span_corrupt(split(text, ' '), doc_id) AS ct")
      .collect()
    assert(docs.length > 0)
    var masked = 0L
    var total = 0L
    docs.foreach { r =>
      val orig = r.getSeq[String](1)
      val in = r.getSeq[scala.collection.Seq[String]](2)(0)
      val tgt = r.getSeq[scala.collection.Seq[String]](2)(1)
      assert(invert(in, tgt) == orig.toSeq,
        s"doc ${r.getLong(0)} did not reconstruct")
      val spans = in.count(_.startsWith("<extra_id_"))
      masked += tgt.size - spans
      total += orig.size
    }
    // expected corruption rate SpanLen/StartMod = 15%
    val ratio = masked.toDouble / total
    assert(ratio > 0.10 && ratio < 0.20, s"corpus mask ratio $ratio")
    // and the driver-facing op's arithmetic stats agree with a recount
    val op = run("span_corrupt").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_masked"))).toMap
    docs.foreach { r =>
      val in = r.getSeq[scala.collection.Seq[String]](2)(0)
      val tgt = r.getSeq[scala.collection.Seq[String]](2)(1)
      val spans = in.count(_.startsWith("<extra_id_")).toLong
      assert(op(r.getLong(0)) == ((spans, tgt.size - spans)),
        s"doc ${r.getLong(0)} stats mismatch")
    }
    // objective prep is per-doc work: the plan must be fully narrow —
    // no exchange of any kind
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("span_corrupt").queryExecution.executedPlan
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.isEmpty, s"span corruption shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("fim_prep: hand-traced splits; PSM digest re-derived corpus-wide; narrow") {
    import java.security.MessageDigest
    def md5(s: String) = MessageDigest.getInstance("MD5").digest(s.getBytes)
      .map(b => f"$b%02x").mkString
    // doc 0, n=5: p1 = 48271 % 6 = 1, p2 = 1 + 117649 % 5 = 5 →
    //   prefix [a], suffix [], middle [b c d e]
    // doc 1, n=5: p1 = 96542 % 6 = 2, p2 = 2 + 134456 % 4 = 2 →
    //   middle empty
    val fixture = Seq((0L, "a b c d e"), (1L, "a b c d e"))
      .toDF("doc_id", "text")
    val m = operators.Sampling.fimPrep(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("p1"), r.getAs[Long]("p2"),
          r.getAs[String]("psm_digest"))).toMap
    assert(m(0L)._1 == 1L && m(0L)._2 == 5L, s"${m(0L)}")
    assert(m(0L)._3 == md5("<PRE> a <SUF> <MID> b c d e"))
    assert(m(1L)._1 == 2L && m(1L)._2 == 2L, s"${m(1L)}")
    assert(m(1L)._3 == md5("<PRE> a b <SUF> c d e <MID>"))
    // corpus-wide: re-derive every doc's PSM string driver-side from
    // the same Lehmer arithmetic and match the digest — proves the
    // serialization is exactly the declared invertible layout
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    val out = run("fim_prep").collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val (id, p1, p2) = (r.getAs[Long]("doc_id"), r.getAs[Long]("p1"),
        r.getAs[Long]("p2"))
      val toks = docs(id)
      val n = toks.length.toLong
      assert(0 <= p1 && p1 <= p2 && p2 <= n, s"doc $id: $p1 $p2 $n")
      assert(p1 == ((id + 1) * operators.Sampling.FimMul1
        % operators.Sampling.FimMod) % (n + 1))
      val psm = (Seq("<PRE>") ++ toks.take(p1.toInt) ++ Seq("<SUF>") ++
        toks.drop(p2.toInt) ++ Seq("<MID>") ++
        toks.slice(p1.toInt, p2.toInt)).mkString(" ")
      assert(r.getAs[String]("psm_digest") == md5(psm), s"doc $id digest")
    }
    // objective prep is per-doc work: fully narrow, no exchange
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("fim_prep").queryExecution.executedPlan
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.isEmpty, s"FIM prep shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("fim_prep / span_corrupt: extreme doc_ids never wrap int64") {
    // (doc_id + 1) * 48271 wraps int64 at doc_id ≈ 1.9e14 under
    // Spark's ANSI-off arithmetic while DuckDB promotes — both
    // engines now reduce doc_id mod FimMod BEFORE the multiply, so
    // splits stay valid (0 <= p1 <= p2 <= n) at any id.
    val hugeIds = Seq(Long.MaxValue, Long.MaxValue - 1, 3_000_000_000_000_000L)
    val fixture = hugeIds.map(id => (id, "a b c d e f g h"))
      .toDF("doc_id", "text")
    operators.Sampling.fimPrep(fixture).collect().foreach { r =>
      val (p1, p2) = (r.getAs[Long]("p1"), r.getAs[Long]("p2"))
      assert(0 <= p1 && p1 <= p2 && p2 <= 8, s"wrapped split: $p1 $p2")
    }
    // same latent pattern in the span-corruption Lehmer hash: huge
    // seeds must stay non-negative and the transform invertible
    hugeIds.foreach { seed =>
      (0 until 50).foreach { pos =>
        val h = graft.plans.SpanCorrupt.hash(seed, pos)
        assert(h >= 0L && h < graft.plans.SpanCorrupt.Mod, s"$seed/$pos → $h")
      }
    }
    graft.plans.GraftFunctions.register(spark)
    val ct = fixture.selectExpr(
      "split(text, ' ') AS toks",
      "graft_span_corrupt(split(text, ' '), doc_id) AS ct").collect()
    ct.foreach { r =>
      val toks = r.getSeq[String](0)
      val Seq(input, target) = r.getSeq[scala.collection.Seq[String]](1).toSeq
      // reconstruct: splice each sentinel's target run back into input
      val runs = scala.collection.mutable.Map[String, Seq[String]]()
      var cur: String = null
      target.foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; runs(cur) = Seq() }
        else runs(cur) = runs(cur) :+ t
      }
      val rebuilt = input.flatMap(t =>
        if (t.startsWith("<extra_id_")) runs(t) else Seq(t))
      assert(rebuilt == toks, s"huge-seed corruption not invertible")
    }
  }

  test("dedup_substring: cross-doc span, self-repeat merge, clean/short docs") {
    // W=8. d1 and d2 share the 8-token run s1..s8 (each contributes
    // one duplicated window): cov 8, 1 region each. d3 repeats its
    // own 8-token phrase back-to-back: duplicated starts {0, 8} —
    // adjacent coverage merges into ONE region covering all 16
    // tokens. d4 is clean; d5 is shorter than W (no windows at all).
    val s18 = (1 to 8).map(i => s"s$i").mkString(" ")
    val p18 = (1 to 8).map(i => s"p$i").mkString(" ")
    val fixture = Seq(
      (1L, s"u1 u2 $s18 u3"),
      (2L, s"v1 $s18 v2 v3"),
      (3L, s"$p18 $p18"),
      (4L, (1 to 12).map(i => s"c$i").mkString(" ")),
      (5L, "a b c")).toDF("doc_id", "text")
    val m = operators.Dedup.substringDedup(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dup_tokens"), r.getAs[Long]("n_regions"),
          r.getAs[Double]("dup_ratio"))).toMap
    assert(m(1L) == ((8L, 1L, 0.727273)), s"${m(1L)}") // 8/11
    assert(m(2L) == ((8L, 1L, 0.727273)), s"${m(2L)}") // 8/11
    assert(m(3L) == ((16L, 1L, 1.0)), s"${m(3L)}")     // merged whole-doc
    assert(m(4L) == ((0L, 0L, 0.0)), s"${m(4L)}")
    assert(m(5L) == ((0L, 0L, 0.0)), s"${m(5L)}")
    // plan: the corpus text never crosses an exchange — spans reduce
    // to skinny (h, doc, pos) rows before anything shuffles
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("dedup_substring").queryExecution.executedPlan
      plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"corpus text crossed an exchange:\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dedup_substr_ladder: per-W coverage from one lead frame; fixtures at every W") {
    // d1/d2 share an 8-token run with DIFFERENT contexts: visible at
    // W=8 only (no duplicated 16- or 32-window contains it).
    // d6/d7 share a 16-token run: at W=8 the nine duplicated windows
    // merge to the full 16-token region; at W=16 one window covers the
    // same 16; invisible at W=32.
    // d8 is a 32-token phrase repeated back-to-back (64 tokens): the
    // self-repeat is visible at EVERY W and always merges to one
    // whole-doc region (adjacent coverage).
    // d4 clean; d5 shorter than every W.
    val s18 = (1 to 8).map(i => s"s$i").mkString(" ")
    val q116 = (1 to 16).map(i => s"q$i").mkString(" ")
    val r132 = (1 to 32).map(i => s"r$i").mkString(" ")
    val fixture = Seq(
      (1L, s"u1 u2 $s18 u3"),
      (2L, s"v1 $s18 v2 v3"),
      (4L, (1 to 12).map(i => s"c$i").mkString(" ")),
      (5L, "a b c"),
      (6L, s"x1 $q116 x2"),
      (7L, s"y1 y2 $q116"),
      (8L, s"$r132 $r132")).toDF("doc_id", "text")
    val m = operators.Dedup.substringLadder(fixture).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w")) ->
        (r.getAs[Long]("n_dup_tokens"), r.getAs[Long]("n_regions"))).toMap
    assert(m.size == 7 * 3, "one row per (doc, W)")
    assert(m((1L, 8L)) == ((8L, 1L)) && m((2L, 8L)) == ((8L, 1L)))
    assert(m((1L, 16L)) == ((0L, 0L)) && m((1L, 32L)) == ((0L, 0L)))
    assert(m((6L, 8L)) == ((16L, 1L)) && m((7L, 8L)) == ((16L, 1L)))
    assert(m((6L, 16L)) == ((16L, 1L)) && m((7L, 16L)) == ((16L, 1L)))
    assert(m((6L, 32L)) == ((0L, 0L)) && m((7L, 32L)) == ((0L, 0L)))
    // the self-repeat covers the whole doc at every granularity
    Seq(8L, 16L, 32L).foreach { w =>
      assert(m((8L, w)) == ((64L, 1L)), s"d8 at W=$w: ${m((8L, w))}")
    }
    Seq(8L, 16L, 32L).foreach { w =>
      assert(m((4L, w)) == ((0L, 0L)) && m((5L, w)) == ((0L, 0L)))
    }
    // the ladder is PER-DOCUMENT-LOCAL (r18 optimization round): the
    // composed-hash chain runs as one array fold per row, so the plan
    // has NO WindowExec at all — the old shape's posexplode →
    // Window(partitionBy doc_id) exchange of every token row is gone;
    // the only exchanges left are the skinny (w, h) duplicate count
    // and the per-(doc, w) start-list fold, neither of which carries
    // text or raw tokens
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("dedup_substr_ladder").queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty,
        s"ladder hashing must stay per-row local, got ${windows.size} WindowExecs:\n$plan")
      plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.foreach { e =>
        assert(!e.output.exists(a => a.name == "text" || a.name == "tok"
            || a.name == "toks"),
          s"corpus text/tokens crossed an exchange:\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dedup_incremental: new docs checked against history only; asymmetric join") {
    // history (id < 10): h1 carries the 8-run s1..s8; h2 is the exact
    // text new doc 12 repeats. New shard (id >= 10): d10 contains the
    // historical run (coverage 8), d11 is fresh (coverage 0), d12 is
    // an exact copy of h2 (flag + full coverage), d13 shorter than W.
    val s18 = (1 to 8).map(i => s"s$i").mkString(" ")
    val h2text = (1 to 12).map(i => s"z$i").mkString(" ")
    val fixture = Seq(
      (1L, s"a1 a2 $s18 a3"),
      (2L, h2text),
      (10L, s"b1 $s18 b2"),
      (11L, (1 to 15).map(i => s"f$i").mkString(" ")),
      (12L, h2text),
      (13L, "q1 q2 q3")).toDF("doc_id", "text")
    val m = operators.Dedup.incrementalDedup(fixture, split = 10L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("is_exact_dup"), r.getAs[Long]("n_hist_tokens"))).toMap
    assert(m.keySet == Set(10L, 11L, 12L, 13L), "history rows must not appear")
    assert(m(10L) == ((0L, 8L)), s"${m(10L)}")
    assert(m(11L) == ((0L, 0L)), s"${m(11L)}")
    assert(m(12L) == ((1L, 12L)), s"${m(12L)}")
    assert(m(13L) == ((0L, 0L)), s"${m(13L)}")
    // the asymmetric-ingest contract: history joins in only as skinny
    // DISTINCT hash frames — its text reduces before any join, and no
    // history-with-history pairing exists anywhere in the plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("dedup_incremental").queryExecution.executedPlan
      plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"corpus text crossed an exchange:\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dedup_incr_minhash: near-dups of history collide; fresh docs do not") {
    val base = "spark query engine with fast columnar scans and wide hash joins today ok"
    val edited = base.replace("columnar", "vectorized")
    val fixture = Seq(
      (1L, base),
      (2L, "completely different historical content about mixing corpus sources"),
      (10L, base),                                     // exact copy → 8/8 bands
      (11L, edited),                                   // near-dup → >= 1 band
      (12L, "zebra yak xylophone wombat vulture unicorn tiger snake raven quail"))
      .toDF("doc_id", "text")
    val m = operators.Dedup.incrementalMinhash(fixture, split = 10L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hist_bands"), r.getAs[Long]("near_hist"))).toMap
    assert(m.keySet == Set(10L, 11L, 12L), "history rows must not appear")
    assert(m(10L) == ((8L, 1L)), s"exact copy must collide on all bands: ${m(10L)}")
    assert(m(11L)._1 >= 1L && m(11L)._2 == 1L, s"edited copy missed: ${m(11L)}")
    assert(m(12L) == ((0L, 0L)), s"fresh doc flagged: ${m(12L)}")
    // asymmetric ingest: text never crosses an exchange (the history
    // fingerprint store is 8 skinny longs per doc)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("dedup_incr_minhash").queryExecution.executedPlan
      plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.foreach(e => assert(!e.output.exists(_.name == "text"),
        s"corpus text crossed an exchange:\n$e"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("hybrid_rrf: hand-computed fusion; pools bounded; windows above limits") {
    graft.plans.GraftFunctions.register(spark)
    // text side = the search_bm25 fixture: scores d4=2314 (rank 1),
    // d1=1375 (2), d3=880 (3); vector side vs query vec 7 = [1,0,0,0]:
    // v1 cos 1 (rank 1), v4 cos .707107 (2), v2 cos 0 (3), v3 cos -1
    // (4). RRF (C=60, scale 1e6):
    //   id1: 1e6 DIV 62 + 1e6 DIV 61 = 16129 + 16393 = 32522
    //   id4: 16393 + 16129 = 32522 — TIES id1; smaller id wins -> rk 2
    //   id3: 15873 + 15625 = 31498                            -> rk 3
    //   id2: 0 + 15873 = 15873                                -> rk 4
    val docs = Seq(
      (1L, "dup dup cat"), (2L, "cat dog bird"),
      (3L, "hash cat cat cat"), (4L, "dup hash")).toDF("doc_id", "text")
    val embs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(-1f, 0f, 0f, 0f)), (4L, Array(1f, 1f, 0f, 0f)),
      (7L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = operators.Search.hybridRrf(docs, embs).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank_text"),
        r.getAs[Long]("rank_vec"), r.getAs[Long]("rrf"), r.getAs[Long]("rk")))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 32522L, 1L), (4L, 1L, 2L, 32522L, 2L),
      (3L, 3L, 4L, 31498L, 3L), (2L, -1L, 3L, 15873L, 4L)),
      s"got ${got.toSeq}")
    // real-data properties: output bounded by RrfK, every row's rrf
    // recomputes from its ranks, and rank windows only see limited
    // frames (TakeOrdered pools)
    val out = run("hybrid_rrf").collect()
    assert(out.length <= operators.Search.RrfK)
    out.foreach { r =>
      def part(rank: Long) = if (rank < 0) 0L
        else operators.Search.RrfScale / (operators.Search.RrfC + rank)
      assert(r.getAs[Long]("rrf") ==
        part(r.getAs[Long]("rank_text")) + part(r.getAs[Long]("rank_vec")))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("hybrid_rrf").queryExecution.executedPlan
      plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.foreach { w =>
        assert(w.child.collectFirst {
          case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
          case l: org.apache.spark.sql.execution.GlobalLimitExec => l
        }.nonEmpty, s"a rank window runs over an un-limited frame:\n$w")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("text_quality: ratios within [0,1], avg_token_len positive") {
    val out = run("text_quality")
    Seq("digit_ratio", "stopword_ratio", "distinct_ratio").foreach { c =>
      assert(out.filter(col(c) < 0 || col(c) > 1).count() == 0, c)
    }
    assert(out.filter($"avg_token_len" <= 0).count() == 0)
  }

  test("mm_resize: thumbnail == brute-force block means; edits cell-local; non-PNG refuses") {
    graft.plans.GraftFunctions.register(spark)
    val (w, h) = (32, 24)
    val tw = Multimodal.ThumbW
    val th = Multimodal.ThumbH
    def lum(x: Int, y: Int) = Multimodal.plantedLuma(7L, x, y)
    // independent mirror straight from the planted luma (buildPng
    // writes r=g=b=luma and the decoder's (r+g+b)/3 returns it)
    def mirror(l: (Int, Int) => Int): Array[Byte] = {
      val out = new Array[Byte](tw * th)
      for (cy <- 0 until th; cx <- 0 until tw) {
        val y0 = cy * h / th; val y1 = math.max(y0 + 1, (cy + 1) * h / th)
        val x0 = cx * w / tw; val x1 = math.max(x0 + 1, (cx + 1) * w / tw)
        var sum = 0L
        for (y <- y0 until y1; x <- x0 until x1) sum += (l(x, y) & 0xff)
        out(cy * tw + cx) = (sum / ((x1 - x0).toLong * (y1 - y0))).toByte
      }
      out
    }
    val rows = Seq(
      (1L, Multimodal.buildPng(w, h, lum)),
      // top-bit flip: the containing cell's mean moves by >= 32, so
      // the edit is visible through the integer division
      (2L, Multimodal.buildPng(w, h,
        (x, y) => if (x == 9 && y == 11) lum(9, 11) ^ 0x80 else lum(x, y))),
      (3L, Multimodal.buildJpeg(10, 10, 3))).toDF("doc_id", "payload")
      .select($"doc_id",
        expr(s"graft_luma_resize(payload, $tw, $th)").as("t")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))).toMap
    assert(rows(3L) == null, "non-PNG must refuse to resize")
    assert(java.util.Arrays.equals(rows(1L), mirror(lum)),
      "thumbnail != brute-force block means")
    val diff = rows(1L).zip(rows(2L)).count { case (a, b) => a != b }
    assert(diff == 1, s"one-pixel edit touched $diff cells")
    // grid finer than the source: blocks stay non-empty (the dhash
    // nearest-pixel convention)
    val tt = graft.plans.LumaResize.resize(
      Multimodal.buildPng(3, 2, lum), tw, th)
    assert(tt != null && tt.length == tw * th)
    // op shape: image-formatted docs (PNG and, since r13, real
    // baseline JPEG) resize; WAV docs surface ok=0
    val op = run("mm_resize").collect()
    assert(op.nonEmpty)
    op.foreach { r =>
      if (r.getAs[Long]("doc_id") % 3 != 2)
        assert(r.getAs[Long]("ok") == 1L &&
          r.getAs[Long]("thumb_len") == tw.toLong * th, s"$r")
      else assert(r.getAs[Long]("ok") == 0L &&
        r.isNullAt(r.fieldIndex("thumb_digest")), s"$r")
    }
  }

  test("mm_frames: stride sampling before decode; hashes == direct kernel on planted frames") {
    graft.plans.GraftFunctions.register(spark)
    val out = run("mm_frames")
    // decode AFTER sample: the dhash ProjectExec must have the
    // frame_idx FilterExec as a DESCENDANT (structural walk — string
    // positions of "% 3" in the dump were brittle against unrelated
    // modulo expressions and explain-format changes)
    import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def descendants(p: SparkPlan): Seq[SparkPlan] = p match {
      // AQE's wrapper is a LEAF node — recurse into its current plan
      case a: AdaptiveSparkPlanExec => a +: descendants(a.executedPlan)
      case _ => p +: p.children.flatMap(descendants)
    }
    val execPlans = descendants(out.queryExecution.executedPlan)
    val dhashProjects = execPlans.collect {
      case pr: ProjectExec
          if pr.projectList.exists(_.exists(_.prettyName == "graft_dhash")) =>
        pr
    }
    assert(dhashProjects.nonEmpty,
      s"no ProjectExec computes graft_dhash:\n${out.queryExecution.executedPlan}")
    dhashProjects.foreach { pr =>
      val strideFilterBelow = pr.children.flatMap(descendants).exists {
        case f: FilterExec =>
          f.condition.references.exists(_.name == "frame_idx") &&
            f.condition.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Remainder])
        case _ => false
      }
      assert(strideFilterBelow,
        s"decode must happen after stride sampling (frame_idx % " +
          s"${Multimodal.FrameStride} FilterExec must be a descendant of " +
          s"the dhash ProjectExec):\n${out.queryExecution.executedPlan}")
    }
    val rows = out.collect()
    assert(rows.nonEmpty)
    val wantIdx = (0 until Multimodal.ClipFrames by Multimodal.FrameStride)
      .map(_.toLong).toSet
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      assert(rs.map(_.getAs[Long]("frame_idx")).toSet == wantIdx,
        s"doc $id sampled ${rs.map(_.getAs[Long]("frame_idx")).toSeq}")
      rs.foreach { r =>
        val f = r.getAs[Long]("frame_idx")
        val direct = graft.plans.Phash.dhash(Multimodal.buildPng(
          Multimodal.frameW(id), Multimodal.frameH(id),
          Multimodal.plantedLuma(id * Multimodal.ClipFrames + f, _, _)))
        assert(direct != null && r.getAs[Long]("frame_hash") == direct,
          s"doc $id frame $f: streamed hash != direct decode")
      }
    }
  }

  test("mm_phash: dHash invariants — identical 0, one-pixel edit near, unrelated far") {
    graft.plans.GraftFunctions.register(spark)
    def lum(seed: Long)(x: Int, y: Int) = Multimodal.plantedLuma(seed, x, y)
    val base = Multimodal.buildPng(32, 24, lum(42L))
    val same = Multimodal.buildPng(32, 24, lum(42L))
    val edited = Multimodal.buildPng(32, 24,
      (x, y) => if (x == 7 && y == 5) 255 - lum(42L)(7, 5) else lum(42L)(x, y))
    val other = Multimodal.buildPng(32, 24, lum(1042L))
    val jpeg = Multimodal.buildJpeg(10, 10, 3)
    val rows = Seq((1L, base), (2L, same), (3L, edited), (4L, other), (5L, jpeg))
      .toDF("doc_id", "payload")
      .select($"doc_id", expr("graft_dhash(payload)").as("h")).collect()
    val h = rows.filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.keySet == Set(1L, 2L, 3L, 4L), "JPEG skeleton must hash NULL")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) == h(2L), "identical payloads must hash identically")
    assert(ham(h(1L), h(3L)) <= Multimodal.PhashMaxHamming,
      s"one-pixel edit drifted ${ham(h(1L), h(3L))} bits")
    assert(ham(h(1L), h(4L)) > 16,
      s"unrelated images too close: ${ham(h(1L), h(4L))} bits")
  }

  test("mm_phash: adversarial payloads hash NULL — no crash, no hang") {
    import graft.plans.Phash
    val good = Multimodal.buildPng(16, 16, Multimodal.plantedLuma(9L, _, _))
    assert(Phash.dhash(good) != null, "baseline payload must decode")

    // (1) declared chunk length near 2^31: Int arithmetic would wrap
    // the bounds check negative and index past the buffer — must
    // refuse, not throw (first IDAT length field sits at offset 33)
    val hugeLen = good.clone()
    java.nio.ByteBuffer.wrap(hugeLen, 33, 4).putInt(0x7ffffff0)
    assert(Phash.dhash(hugeLen) == null)

    // (2) zlib stream with FDICT set: inflate() returns 0 with
    // needsInput()==false and finished()==false — must bail, not spin
    // (CMF=0x78, FLG=0x20 keeps (CMF·256+FLG) % 31 == 0)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.putInt(body.length)
      bb.put(tag.getBytes("US-ASCII")); bb.put(body); bb.putInt(0)
      bb.array() // CRC unchecked by the kernel
    }
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(16).putInt(16).put(Array[Byte](8, 0, 0, 0, 0)).array()
    val fdict = sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", Array[Byte](0x78, 0x20, 0, 0, 0, 1)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Phash.dhash(fdict) == null)

    // (3) nonzero IHDR compression / filter method: only method 0 is
    // defined — decoding as-if-standard would hash garbage
    val badComp = good.clone(); badComp(26) = 1
    val badFilt = good.clone(); badFilt(27) = 1
    assert(Phash.dhash(badComp) == null)
    assert(Phash.dhash(badFilt) == null)
  }

  test("mm_phash: kernel decode matches javax.imageio on JDK-encoded (filtered) PNGs") {
    // the JDK PNG encoder emits real adaptive scanline filters
    // (Sub/Up/Paeth), so decoding its output exercises the defilter
    // branches our zero-filter builder never produces; the expected
    // hash recomputes from the DECODED pixel grid independently
    graft.plans.GraftFunctions.register(spark)
    val (w, hgt) = (40, 30)
    val img = new java.awt.image.BufferedImage(
      w, hgt, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until hgt; x <- 0 until w) {
      val v = Multimodal.plantedLuma(7L, x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val jdkPng = baos.toByteArray
    val got = Seq((1L, jdkPng)).toDF("doc_id", "payload")
      .select(expr("graft_dhash(payload)")).head()
    assert(!got.isNullAt(0), "kernel refused a JDK-encoded PNG")
    // independent expectation from the BufferedImage's own pixels
    val cells = Array.tabulate(8, 9) { (cy, cx) =>
      val (y0, y1) = (cy * hgt / 8, math.max(cy * hgt / 8 + 1, (cy + 1) * hgt / 8))
      val (x0, x1) = (cx * w / 9, math.max(cx * w / 9 + 1, (cx + 1) * w / 9))
      var sum = 0L
      for (y <- y0 until y1; x <- x0 until x1) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3
      }
      (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
    }
    var want = 0L
    for (bit <- 0 until 64)
      if (cells(bit / 8)(bit % 8 + 1) > cells(bit / 8)(bit % 8)) want |= 1L << bit
    assert(got.getLong(0) == want,
      f"kernel hash ${got.getLong(0)}%016x != imageio-derived $want%016x")
  }

  test("mm_phash: op output shape and banded (window-free) plan") {
    val out = run("mm_phash").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 3 != 2,
        "only image (PNG/JPEG) docs carry a phash")
      val mh = r.getAs[Long]("min_hamming")
      assert(mh == -1L || (mh >= 0L && mh <= Multimodal.PhashMaxHamming))
      assert((mh == -1L) == (r.getAs[Long]("n_near_dups") == 0L))
    }
    // inherits the dedup_simhash bucket contract: population sizing by
    // skinny aggregate broadcast, never a window over band buckets
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("mm_phash").queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"band bucket sizing regressed to a window:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("mine_bitext: margin ranks planted pairs first and demotes the hub decoy") {
    // hand candidate frame: two genuine pairs (0↔1, 2↔3), a HUB target
    // (9) moderately close to BOTH sources, and noise pairs. Pools
    // (MineK=4 keeps all): s0 avg=(.99+.80+.10)/3, s2 avg=(.98+.80+.05)/3,
    // t1 avg=(.99+.05)/2, t3 avg=(.98+.10)/2, t9 avg=(.80+.80)/2=.80.
    //   margin(0,1)=1.98/(0.63+0.52)≈1.7217  margin(0,9)=1.60/1.43≈1.1189
    //   margin(2,3)=1.96/(0.61+0.54)≈1.7043  margin(2,9)=1.60/1.41≈1.1348
    // the hub's inflated backward pool is exactly what the ratio margin
    // divides away — despite cos .80 it stays under the 1.2 gate.
    val scored = Seq(
      (0L, 1L, 0.99), (2L, 3L, 0.98),
      (0L, 9L, 0.80), (2L, 9L, 0.80),
      (0L, 3L, 0.10), (2L, 1L, 0.05))
      .toDF("s_id", "t_id", "cos")
    val best = Similarity.mineBitextScored(scored).collect()
      .map(r => r.getAs[Long]("s_id") ->
        (r.getAs[Long]("t_id"), r.getAs[Double]("margin"),
          r.getAs[Long]("accepted"))).toMap
    assert(best.keySet == Set(0L, 2L))
    assert(best(0L)._1 == 1L && best(2L)._1 == 3L,
      s"genuine pairs must out-rank the hub: $best")
    assert(math.abs(best(0L)._2 - 1.721739) < 1e-4, s"${best(0L)}")
    assert(math.abs(best(2L)._2 - 1.704348) < 1e-4, s"${best(2L)}")
    assert(best(0L)._3 == 1L && best(2L)._3 == 1L, s"margins above gate: $best")
    // a structure-less world: best cos ≈ pool mean → margin ≈ 1, rejected
    val flat = Seq((0L, 1L, 0.5), (0L, 3L, 0.5), (2L, 1L, 0.5), (2L, 3L, 0.5))
      .toDF("s_id", "t_id", "cos")
    Similarity.mineBitextScored(flat).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("margin") - 1.0) < 1e-9 &&
        r.getAs[Long]("accepted") == 0L, r.toString)
    }
  }

  test("mine_bitext: end-to-end LSH mining finds exact-scale planted pairs") {
    // tgt_i is an exact POSITIVE-SCALE copy of src_i: sign bits (hence
    // every LSH band key) are scale-invariant, so the planted pair is a
    // guaranteed candidate — no reliance on hyperplane luck
    def v(dim: Int, at: Int, scale: Float) =
      Array.tabulate(dim)(i => if (i == at) scale else 0.0f).toSeq
    val src = Seq((0L, v(4, 0, 2.0f)), (2L, v(4, 1, 3.0f)), (4L, v(4, 2, 1.0f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((1L, v(4, 0, 0.5f)), (3L, v(4, 1, 1.5f)), (5L, v(4, 2, 4.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mineBitext(src, tgt, bits = 2).collect()
      .map(r => r.getAs[Long]("s_id") ->
        (r.getAs[Long]("t_id"), r.getAs[Double]("cos"))).toMap
    assert(out.keySet == Set(0L, 2L, 4L), "one decision per source")
    assert(out(0L) == ((1L, 1.0)) && out(2L) == ((3L, 1.0)) &&
      out(4L) == ((5L, 1.0)), s"planted exact pairs must win: $out")
    // driver shape on real data: one row per even-id source, targets
    // odd (or -1 when no shared bucket), margins non-negative, and the
    // plan stays banded + heap-bounded — no cartesian anywhere
    val e = Tables(spark, sfDir, "embeddings")
    val nSrc = e.filter($"vec_id" % 2 === 0).count()
    val full = run("mine_bitext")
    val rows = full.collect()
    assert(rows.length.toLong == nSrc)
    rows.foreach { r =>
      val t = r.getAs[Long]("t_id")
      assert(r.getAs[Long]("s_id") % 2 == 0 && (t == -1L || t % 2 == 1))
      assert(r.getAs[Double]("margin") >= 0.0)
      assert(Set(0L, 1L).contains(r.getAs[Long]("accepted")))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = run("mine_bitext").queryExecution.executedPlan
      assert(plan.toString.contains("TopKPerKey"),
        "margin pools must run through the bounded heap")
      plan.foreach {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
          fail(s"all-pairs join in mining plan:\n$c")
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          fail(s"nested-loop join in mining plan:\n$b")
        case _ => ()
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
