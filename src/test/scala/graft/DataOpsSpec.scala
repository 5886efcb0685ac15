package graft

import graft.operators.DataOps
import org.apache.spark.sql.functions._

class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  test("epoch_shuffle: per-epoch positions are exactly 0..N-1, orders differ across epochs, re-run is bit-identical") {
    val out = SparkEntry.queries("epoch_shuffle")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = out.map(_._2).distinct.length
    assert(out.length == DataOps.Epochs * n)
    // bijection per epoch: positions are a permutation of 0..N-1
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (0L until n.toLong))
    }
    // the two epochs genuinely shuffle differently
    val ord0 = out.filter(_._1 == 0L).sortBy(_._4).map(_._2).toSeq
    val ord1 = out.filter(_._1 == 1L).sortBy(_._4).map(_._2).toSeq
    assert(ord0 != ord1, "epochs must not share an order")
    assert(ord0 != ord0.sorted, "epoch 0 must not be the identity order")
    // determinism: a re-run reproduces every position bit-identically
    val again = SparkEntry.queries("epoch_shuffle")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(again == out.map(t => (t._1, t._2, t._4)).toSet)
  }

  test("epoch_shuffle fixture: rank equals a brute-force sort by (xxhash64(doc_id, epoch), doc_id)") {
    val docs = Seq(3L, 7L, 11L, 100L, 101L).toDF("doc_id")
    val out = DataOps.epochShuffle(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // expected: collect the keys and rank by (skey, doc_id) per epoch
    val keys = docs
      .withColumn("epoch", explode(sequence(lit(0L), lit(1L))))
      .withColumn("skey", xxhash64(col("doc_id"), col("epoch")))
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
    val expected = keys.groupBy(_._1).toSeq.flatMap { case (ep, rs) =>
      rs.sortBy(t => (t._3, t._2)).zipWithIndex.toSeq
        .map { case ((_, d, k), i) => (ep, d, k, i.toLong) }
    }.toSet
    assert(out.toSet == expected)
  }

  test("data_contract: healthy corpus passes every rule; planted violations are counted with the lowest offender") {
    val corpus = SparkEntry.queries("data_contract")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(corpus.length == 6)
    corpus.foreach { case (rule, checked, viol, ppm, bad) =>
      assert(checked > 0L)
      assert(viol == 0L && ppm == 0L && bad == -1L,
        s"healthy corpus violates $rule")
    }
    // planted fixture: one violation per rule, ids chosen so the
    // LOWEST offender per rule is pinned
    val docs = Seq(
      (1L, "fine text", "en", "src1", 9L),
      (2L, "", "en", "src2", 0L), // nonempty + len_bounds (n_chars=0)
      (3L, "abc", "en", "src3", 99L), // len_consistent
      (4L, "ok", "xx", "src4", 2L), // lang_known
      (5L, "ok", "en", "SRC-5", 2L), // source_format
      (6L, "a <|user|> injection", "en", "src6", 20L)) // markers_clean
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DataOps.dataContract(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(4))).toMap
    assert(out("nonempty") == ((6L, 1L, 2L)))
    assert(out("len_bounds") == ((6L, 1L, 2L)))
    assert(out("len_consistent") == ((6L, 1L, 3L)))
    assert(out("lang_known") == ((6L, 1L, 4L)))
    assert(out("source_format") == ((6L, 1L, 5L)))
    assert(out("markers_clean") == ((6L, 1L, 6L)))
    // ppm arithmetic: 1 violation of 6 → 166666 ppm truncated
    val ppm = DataOps.dataContract(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ppm("nonempty") == 166666L)
  }

  test("shard_manifest: shards partition the corpus, digests are arrival-order-free, a planted mutation moves the digest") {
    val corpus = SparkEntry.queries("shard_manifest")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(7)))
    assert(corpus.map(_._1).sorted.toSeq == (0L until DataOps.Shards))
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(corpus.map(_._2).sum == nDocs, "shards partition the corpus")
    // order independence: a reversed/re-partitioned input folds the
    // same manifest bit-for-bit
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val again = DataOps.shardManifest(docs.orderBy(col("doc_id").desc)
        .repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(7)))
    assert(again.sortBy(_._1).toSeq == corpus.sortBy(_._1).toSeq)
    // tamper detection: dropping one row moves (n_docs, digest_fold)
    // in exactly that row's shard
    val tampered = DataOps.shardManifest(docs.where(col("doc_id") =!= 0L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(7)))
      .toMap
    val orig = corpus.map(t => t._1 -> (t._2, t._4)).toMap
    val moved = orig.keys.filter(k => orig(k) != tampered(k))
    assert(moved.size == 1, s"exactly one shard must move: $moved")
  }

  test("longctx_stitch: hand fixture — atoms, separators, overflow segment; corpus invariants") {
    // source 0: lengths 10, 10, 4090 with separators at +1
    //   doc 1 at pos 0 -> seg 0 off 0..10
    //   doc 2 at pos 11 -> seg 0 off 11..21
    //   doc 3 at pos 22 -> seg 0 (atom rule: starts inside seg 0),
    //     spans past 4096 - the segment absorbs the overflow
    // source 1: single long doc 5000 -> seg 0, next doc starts at
    //   5001 -> seg 1 (id 5001 DIV 4096 = 1)
    val docs = Seq(
      (0L, 1L, 10L), (0L, 2L, 10L), (0L, 3L, 4090L),
      (1L, 4L, 5000L), (1L, 5L, 10L))
      .toDF("src_idx", "doc_id", "n_chars")
    val out = DataOps.longctxStitch(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(t => (t._1, t._2))
    assert(out(0) == ((0L, 1L, 0L, 0L, 10L)))
    assert(out(1) == ((0L, 2L, 0L, 11L, 21L)))
    assert(out(2) == ((0L, 3L, 0L, 22L, 4112L)))
    assert(out(3) == ((1L, 4L, 0L, 0L, 5000L)))
    assert(out(4) == ((1L, 5L, 1L, 0L, 10L)))
    // corpus invariants: spans inside a segment never overlap, docs
    // tile each segment in doc order with 1-char separators between
    val corpus = SparkEntry.queries("longctx_stitch")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(corpus.length ==
      Tables(spark, sfDir, "documents").count())
    corpus.groupBy(t => (t._1, t._3)).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_._2)
      assert(inOrder.head._4 == 0L, "segments start at offset 0")
      inOrder.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._5 + 1L,
          s"separator gap broken between ${a._2} and ${b._2}")
        case _ =>
      }
    }
  }

  test("quality_fuse: hand fixture — min-max normalization, constant-scorer neutrality, fused mean") {
    // s1 spans 10..30 (doc 2 at midpoint), s2 constant, s3 spans 0..100
    val scored = Seq(
      (1L, 10L, 7L, 0L),
      (2L, 20L, 7L, 100L),
      (3L, 30L, 7L, 50L))
      .toDF("doc_id", "s1", "s2", "s3")
    val out = DataOps.qualityFuse(scored).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).sortBy(_._1)
    // doc 1: n1=0, n2=500000 (constant scorer is neutral), n3=0
    assert(out(0) == ((1L, 0L, 500000L, 0L, 166666L)))
    // doc 2: n1=500000, n3=1e6 → fused (0.5e6+0.5e6+1e6)/3
    assert(out(1) == ((2L, 500000L, 500000L, 1000000L, 666666L)))
    // doc 3: n1=1e6, n3=500000
    assert(out(2) == ((3L, 1000000L, 500000L, 500000L, 666666L)))
  }

  test("quality_fuse corpus invariants: norms span [0,1e6] with both extremes hit, fused is the truncated mean") {
    val rows = SparkEntry.queries("quality_fuse")(spark, sfDir).collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    Seq(rows.map(_._1), rows.map(_._2), rows.map(_._3)).foreach { ns =>
      assert(ns.min == 0L && ns.max == 1000000L,
        "each scorer's normalization must hit both extremes")
    }
    rows.foreach { case (n1, n2, n3, f) =>
      assert(f == (n1 + n2 + n3) / 3)
    }
  }

  test("json_fields: corpus coverage is total; planted fixture pins each failure mode's counter") {
    val corpus = SparkEntry.queries("json_fields")(spark, sfDir).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val (n, nj, nk, cov) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(8))
      assert(nj == n && nk == n && cov == 1000000L,
        s"generator props are all valid+numeric: ${r.getString(0)}")
      assert(r.getLong(5) >= 0L && r.getLong(6) >= r.getLong(5))
    }
    // failure modes: malformed JSON, missing key, non-numeric value
    val ev = Seq(
      ("click", """{"k": 5}"""),
      ("click", """{"k": 7}"""),
      ("click", """not json"""), // malformed → neither json nor k
      ("view", """{"x": 1}"""), // valid json, missing k
      ("view", """{"k": "abc"}""")) // valid json, non-numeric k
      .toDF("event_type", "props")
    val out = DataOps.jsonFields(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8))).toMap
    // click: 3 events, 2 json, 2 with k (5,7), distinct 2, sum 12
    assert(out("click") == ((3L, 2L, 2L, 2L, 5L, 7L, 12L, 666666L)))
    // view: 2 events, 2 json, 0 with k → sentinels -1/-1/0, cov 0
    assert(out("view") == ((2L, 2L, 0L, 0L, -1L, -1L, 0L, 0L)))
  }

  test("needle_plant: hand fixture — offset arithmetic exact at depth 0, interior, and near-end; substring round-trip proves it") {
    // doc_id drives depth: 1000 * k ≡ (id * 2654435761) % 1000. Pick
    // ids whose permille lands at 0, mid, and high.
    def permille(id: Long) = (id * 2654435761L) % 1000
    // 2654435761 ≡ 761 (mod 1000) is coprime to 1000, so permille 0
    // needs id ≡ 0 (mod 1000): the multiplier never zeroes small ids
    val id0 = 1000L
    assert(permille(id0) == 0L)
    val ids = (1L to 400L)
    val idMid = ids.find(i => permille(i) >= 400 && permille(i) < 600).get
    val idHi = ids.find(permille(_) >= 990).get
    val text = (1 to 10).map(i => s"tok$i").mkString(" ") // 10 tokens
    val d = Seq(id0, idMid, idHi).map(i => (i, text))
      .toDF("doc_id", "text")
    val out = DataOps.needlePlant(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("insert_after_tok"), r.getAs[Long]("needle_off"),
          r.getAs[Long]("total_len"), r.getAs[Long]("plant_ok"))).toMap
    // manual render check for each: k tokens, then the needle
    Seq(id0, idMid, idHi).foreach { id =>
      val k = (permille(id) * 10) / 1000
      val toks = text.split(" ")
      val needle = s"NEEDLE-$id"
      val rendered = (toks.take(k.toInt) ++ Array(needle) ++
        toks.drop(k.toInt)).mkString(" ")
      val expOff = rendered.indexOf(needle).toLong
      assert(out(id)._1 == k, s"id $id insert point")
      assert(out(id)._2 == expOff,
        s"id $id offset: got ${out(id)._2}, rendered expects $expOff")
      assert(out(id)._3 == rendered.length.toLong)
      assert(out(id)._4 == 1L, s"id $id substring round-trip")
    }
    assert(out(id0)._2 == 0L, "depth-0 needle sits at offset 0")
  }

  test("needle_plant: every corpus row plants cleanly and depths cover the permille range") {
    val out = SparkEntry.queries("needle_plant")(spark, sfDir)
    assert(out.filter($"plant_ok" =!= 1L).count() == 0,
      "every substring round-trip must succeed")
    val depths = out.select("depth_permille").distinct().count()
    assert(depths > 100, s"depth coverage too narrow: $depths bands")
  }

  test("shard_rebalance: targets tile the total exactly, water-filling flow conserves") {
    import graft.operators.DataOps
    val rows = SparkEntry.queries("shard_rebalance")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.length.toLong == DataOps.Shards)
    val tot = rows.map(_._2).sum
    // integer targets sum to the total EXACTLY (no remainder limbo)
    assert(rows.map(_._3).sum == tot)
    rows.foreach { case (sid, _, target, surplus, _) =>
      assert(math.abs(target - tot / DataOps.Shards) <= 1L, s"shard $sid")
      assert(surplus == rows.find(_._1 == sid).get._2 - target)
    }
    // flow is the running surplus sum and the LAST boundary is 0 —
    // conservation: what leaves the line must have entered it
    var cum = 0L
    rows.foreach { case (sid, _, _, surplus, flow) =>
      cum += surplus
      assert(flow == cum, s"shard $sid flow")
    }
    assert(rows.last._5 == 0L)
    // the plan is balanced after the moves: applying the boundary
    // flows leaves every shard at its target
    rows.zipWithIndex.foreach { case ((_, mass, target, _, flowOut), i) =>
      val flowIn = if (i == 0) 0L else rows(i - 1)._5
      assert(mass + flowIn - flowOut == target)
    }
  }

  test("span_align: the covering hull re-derived by scalar scan agrees everywhere") {
    // the third engine: char→token by counting spaces in the prefix
    def hull(text: String, cs: Long, cl: Long): (Long, Long, Long) = {
      def tokAt(c: Long): Long =
        if (c == 0) 0L else text.substring(0, c.toInt).count(_ == ' ')
      val ts = tokAt(cs)
      val te = text.substring(0, (cs + cl).toInt).count(_ == ' ')
      val boundary =
        if (cs == 0 || text.charAt(cs.toInt - 1) == ' ') 1L else 0L
      (ts, te - ts + 1, boundary)
    }
    val texts = graft.Tables(spark, sfDir, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = SparkEntry.queries("span_align")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == texts.size)
    rows.foreach { case (id, cs, cl, ts, tl, ab) =>
      val text = texts(id)
      assert(cl >= 1L && cs + cl <= text.length, s"doc $id clip")
      val (hts, htl, hab) = hull(text, cs, cl)
      assert((ts, tl, ab) == (hts, htl, hab), s"doc $id")
      // the hull actually covers: the span substring is contained in
      // the join of the covering tokens
      val toks = text.split(" ", -1)
      val covered = toks.slice(ts.toInt, (ts + tl).toInt).mkString(" ")
      assert(covered.contains(
        text.substring(cs.toInt, (cs + cl).toInt).trim), s"doc $id cover")
    }
    // both boundary classes occur on the corpus (the QC signal is
    // meaningful only if mid-token starts actually happen)
    assert(rows.exists(_._6 == 1L) && rows.exists(_._6 == 0L))
  }
}
