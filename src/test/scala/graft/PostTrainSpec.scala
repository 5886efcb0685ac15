package graft

import graft.operators.PostTrain
import org.apache.spark.sql.functions._

class PostTrainSpec extends SparkSpec {
  import spark.implicits._

  test("sft_render: offsets cut exactly the turn content, mask keeps assistant turns, digest matches a hand-built render") {
    val turns = Seq(
      (0L, 0L, "user", "hello there"),
      (0L, 1L, "assistant", "hi"),
      (0L, 2L, "user", "bye"),
      (0L, 3L, "assistant", "see you"),
      (7L, 0L, "user", "solo"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = PostTrain.sftRender(turns).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7)))
      .sortBy(t => (t._1, t._2))

    // hand-build the rendered conversation 0 and its md5
    val rendered = "<|user|>hello there<|end|>" + "<|assistant|>hi<|end|>" +
      "<|user|>bye<|end|>" + "<|assistant|>see you<|end|>"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(rendered.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val conv0 = out.filter(_._1 == 0L)
    assert(conv0.length == 4)
    conv0.foreach { case (_, _, role, start, end, inLoss, digest, len) =>
      assert(digest == md)
      assert(len == rendered.length.toLong)
      assert(inLoss == (if (role == "assistant") 1L else 0L))
      // the span is the CONTENT (header/tag excluded)
      val cut = rendered.substring(start.toInt, end.toInt)
      assert(!cut.contains("<|") && !cut.contains("|>"), cut)
    }
    // spans in turn order, exact content recovery
    val texts = Seq("hello there", "hi", "bye", "see you")
    conv0.zip(texts).foreach { case ((_, _, _, s0, e0, _, _, _), t) =>
      assert(rendered.substring(s0.toInt, e0.toInt) == t)
    }
    // singleton conversation renders alone
    val solo = out.filter(_._1 == 7L)
    assert(solo.length == 1 && solo.head._8 == "<|user|>solo<|end|>".length)
  }

  test("sft_render corpus invariants: spans nested in conv_len, non-overlapping, assistant-only mask") {
    val rows = SparkEntry.queries("sft_render")(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (conv, rs) =>
      val len = rs.head.getLong(7)
      assert(rs.map(_.getString(6)).distinct.length == 1,
        s"conv $conv: digest must be conversation-constant")
      val sorted = rs.sortBy(_.getLong(1))
      sorted.foreach { r =>
        assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= len)
        assert((r.getLong(5) == 1L) == (r.getString(2) == "assistant"))
      }
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(3),
          s"conv $conv: overlapping spans")
        case _ => ()
      }
    }
  }

  test("dpo_pairs: argmax/argmin with opposite tie-breaks; degenerate groups dropped") {
    val scored = Seq(
      // clean ordering: chosen=11 (300), rejected=13 (50)
      (0L, 10L, 100L), (0L, 11L, 300L), (0L, 12L, 200L), (0L, 13L, 50L),
      // top tie (20,21 both 9): chosen = LOWER doc 20;
      // bottom tie (22,23 both 1): rejected = HIGHER doc 23
      (1L, 20L, 9L), (1L, 21L, 9L), (1L, 22L, 1L), (1L, 23L, 1L),
      // all tied -> margin 0 -> dropped
      (2L, 30L, 5L), (2L, 31L, 5L),
      // singleton -> chosen == rejected -> dropped
      (3L, 40L, 7L))
      .toDF("prompt_id", "doc_id", "score")
    val out = PostTrain.dpoPairs(scored).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      .toSet
    assert(out == Set((0L, 11L, 13L, 250L), (1L, 20L, 23L, 8L)))
  }

  test("dpo_pairs corpus invariants: chosen beats rejected, pair docs share the prompt group") {
    val rows = SparkEntry.queries("dpo_pairs")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, c, j) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(c != j && c / PostTrain.TurnsPerConv == p &&
        j / PostTrain.TurnsPerConv == p)
      assert(r.getLong(3) > r.getLong(4) &&
        r.getLong(5) == r.getLong(3) - r.getLong(4))
    }
  }

  test("best_of_n: floor filters, rank caps at BonKeep, ties break on doc_id") {
    // mean score = (10+9+9+2+2+4) / 6 = 6
    val scored = Seq(
      (0L, 1L, 10L), (0L, 2L, 9L), (0L, 3L, 9L), (0L, 4L, 2L),
      (1L, 5L, 2L), // below floor: prompt contributes nothing
      (2L, 6L, 4L)) // below floor
      .toDF("prompt_id", "doc_id", "score")
    val out = PostTrain.bestOfN(scored).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // prompt 0: 10 ranks 1; the 9-tie breaks to lower doc_id 2 at
    // rank 2; doc 3 (rank 3) exceeds BonKeep, doc 4 under floor
    assert(out == Set((0L, 1L, 1L), (0L, 2L, 2L)))
  }

  test("best_of_n corpus invariants: ranks dense from 1, capped, all kept scores clear the corpus mean") {
    val scoredRows = Tables(spark, sfDir, "documents").select(
      expr(s"doc_id DIV ${PostTrain.TurnsPerConv}").as("p"),
      (size(array_distinct(split(col("text"), " "))).cast("long") *
        100000L + col("n_chars")).as("s")).collect()
    val mean = scoredRows.map(_.getLong(1)).sum.toDouble / scoredRows.length
    val rows = SparkEntry.queries("best_of_n")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, rank, score) =>
      assert(rank >= 1 && rank <= PostTrain.BonKeep)
      assert(score.toDouble >= mean)
    }
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._3).sorted.sameElements(1L to rs.length.toLong),
        s"prompt $p: ranks not dense")
    }
  }

  test("conv_paths: complete ternary tree flattens to exactly the root-to-leaf paths") {
    // ids 0..12 = root + 3 children + 9 grandchildren; n_chars = id*10
    val nodes = (0L to 12L).map(i => (i, i * 10L)).toDF("id", "n_chars")
    val out = PostTrain.convPaths(nodes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (4L to 12L).toSeq) // the 9 leaves
    out.foreach { case (leaf, depth, path, chars) =>
      assert(depth == 2L)
      val parent = (leaf - 1) / 3
      assert(path == s"0/$parent/$leaf")
      assert(chars == 0L + parent * 10 + leaf * 10)
    }
  }

  test("sft_pack: whole conversations, overflow absorbed, spans remapped to pack coordinates") {
    // single-turn conversations with picked lengths; header '<|user|>'
    // is 8 chars, tag '<|end|>' is 7 → conv_len = text + 15
    def turn(conv: Long, n: Int) = (conv, 0L, "user", "a" * n)
    val turns = Seq(turn(0, 1000), turn(1, 900), turn(2, 500),
      turn(3, 3000), turn(4, 10))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = PostTrain.sftPack(PostTrain.sftRender(turns)).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // cum lens: 0, 1015, 1930, 2445, 5460 → packs 0,0,0,1,2
    assert(out(0L) == (0L, 0L, 8L, 1008L))
    assert(out(1L) == (0L, 1015L, 1023L, 1923L))
    assert(out(2L) == (0L, 1930L, 1938L, 2438L)) // pack 0 overflows; atom kept whole
    assert(out(3L) == (1L, 0L, 8L, 3008L)) // over-long conv owns pack 1
    assert(out(4L) == (2L, 0L, 8L, 18L)) // pack 2 after the long atom's skip
  }

  test("sft_pack corpus invariants: contiguous non-overlapping members per pack, spans = pack_off + render offsets") {
    val rendered = SparkEntry.queries("sft_render")(spark, sfDir)
    val renderRows = rendered.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(7))).toMap
    val rows = SparkEntry.queries("sft_pack")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // spans are the render offsets shifted by pack_off
    rows.foreach { case (conv, turn, _, off, s0, e0, _) =>
      val (rs, re, _) = renderRows((conv, turn))
      assert(s0 == off + rs && e0 == off + re)
    }
    // one pack per conversation; members tile the pack contiguously
    val perConv = rows.groupBy(_._1)
    perConv.foreach { case (conv, rs) =>
      assert(rs.map(r => (r._3, r._4)).distinct.length == 1,
        s"conv $conv: split across packs")
    }
    val convLen = renderRows.toSeq.groupBy(_._1._1)
      .map { case (c, ts) => c -> ts.head._2._3 }
    rows.map(r => (r._3, r._1, r._4)).distinct.groupBy(_._1)
      .foreach { case (pack, members) =>
        val sorted = members.sortBy(_._3)
        assert(sorted.head._3 == 0L, s"pack $pack: first member not at 0")
        sorted.sliding(2).foreach {
          case Array((_, c1, o1), (_, _, o2)) =>
            assert(o1 + convLen(c1) == o2,
              s"pack $pack: gap/overlap after conv $c1")
          case _ => ()
        }
      }
  }

  test("template_audit: collision counts, first position, clean bit") {
    val docs = Seq(
      (0L, "plain prose, nothing reserved"),
      (1L, "an injected <|assistant|> header"),
      (2L, "<| at start and |> later and <| again"),
      (3L, "only a close marker |> here"))
      .toDF("doc_id", "text")
    val res = PostTrain.templateAudit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(res(0L) == (0L, 0L, 0L, 1L))
    assert(res(1L) == (1L, 1L, 13L, 0L)) // '<|' at 1-based 13
    assert(res(2L) == (2L, 1L, 1L, 0L)) // earliest marker at position 1
    assert(res(3L) == (0L, 1L, 21L, 0L))
  }

  test("template_audit corpus invariants: clean iff zero counts, first_collision inside the doc") {
    val docs = Tables(spark, sfDir, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("template_audit")(spark, sfDir).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (id, no, nc, fp, clean) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert((clean == 1L) == (no + nc == 0L))
      if (clean == 1L) assert(fp == 0L)
      else assert(fp >= 1L && fp <= docs(id).length.toLong)
    }
  }

  test("conv_paths corpus invariants: every path roots at 0 with consistent parent links and summed chars") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxId = docs.keys.max
    val rows = SparkEntry.queries("conv_paths")(spark, sfDir).collect()
    // one output row per leaf of the id set
    val leaves = docs.keys.filter(_ * 3 + 1 > maxId)
    assert(rows.length == leaves.size)
    rows.foreach { r =>
      val ids = r.getString(2).split("/").map(_.toLong).toSeq
      assert(ids.head == 0L && ids.last == r.getLong(0))
      assert(ids.length.toLong == r.getLong(1) + 1)
      ids.sliding(2).foreach {
        case Seq(p, c) => assert((c - 1) / 3 == p, s"broken link $p -> $c")
        case _ => ()
      }
      assert(r.getLong(3) == ids.map(docs).sum)
    }
  }

  test("prm_pairs: sibling extremes per branch point, tied and single-child groups dropped") {
    // ternary tree over ids 0..7: parent 0 -> {1,2,3}, 1 -> {4,5,6},
    // 2 -> {7}. Parent 1's children all tie (dropped), parent 2 has
    // one child (degenerate, dropped), parent 0 keeps the extremes.
    val nodes = Seq(
      (0L, 50L), (1L, 30L), (2L, 10L), (3L, 20L),
      (4L, 7L), (5L, 7L), (6L, 7L), (7L, 99L))
      .toDF("id", "score")
    val out = PostTrain.prmPairs(nodes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq((0L, 3L, 1L, 2L, 30L, 10L, 20L)))
  }

  test("prm_pairs: ties at the extremes break on id in opposite directions") {
    // parent 0's children: two share the max, two share the min —
    // chosen = smallest id among max, rejected = largest id among min
    val nodes = Seq((1L, 9L), (2L, 9L), (3L, 1L))
      .toDF("id", "score")
      .union(Seq((0L, 0L)).toDF("id", "score")) // root, never a child
    val out = PostTrain.prmPairs(nodes).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(6)))
    assert(out.toSeq == Seq((0L, 1L, 3L, 8L)))
  }

  test("conv_lint: planted violations — double role, wrong first/last, empty turn, clean conv") {
    val turns = Seq(
      // conv 0: clean user/assistant/user/assistant
      (0L, 0L, "user", "a"), (0L, 1L, "assistant", "b"),
      (0L, 2L, "user", "c"), (0L, 3L, "assistant", "d"),
      // conv 1: assistant speaks twice in a row
      (1L, 0L, "user", "a"), (1L, 1L, "assistant", "b"),
      (1L, 2L, "assistant", "c"),
      // conv 2: opens with the assistant, closes with the user
      (2L, 0L, "assistant", "a"), (2L, 1L, "user", "b"),
      // conv 3: alternates but carries an empty turn
      (3L, 0L, "user", ""), (3L, 1L, "assistant", "b"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = PostTrain.convLint(turns).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out(0L) == (4L, 0L, "user", "assistant", 0L, 1L))
    assert(out(1L) == (3L, 1L, "user", "assistant", 0L, 0L))
    assert(out(2L) == (2L, 0L, "assistant", "user", 0L, 0L))
    assert(out(3L) == (2L, 0L, "user", "assistant", 1L, 0L))
  }

  test("conv_lint corpus invariants: the synthetic turns contract is clean by construction") {
    val rows = SparkEntry.queries("conv_lint")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L, s"alternation violation in ${r.getLong(0)}")
      assert(r.getString(3) == "user" && r.getString(4) == "assistant")
      assert(r.getLong(6) == 1L)
    }
  }

  test("pack_stats: exact-fill, overflow and sparse packs hand-derived") {
    val placed = Seq(
      (1L, 1000L, 0L, 0L), (2L, 1048L, 0L, 1000L), // exact fill
      (3L, 3000L, 1L, 0L),                          // overflow absorber
      (4L, 100L, 2L, 0L))                           // sparse tail
      .toDF("conv_id", "conv_len", "pack_id", "pack_off")
    val out = PostTrain.packStats(placed).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out(0L) == (2L, 2048L, 0L, 1000000L))
    assert(out(1L) == (1L, 3000L, 952L, 1000000L))
    assert(out(2L) == (1L, 100L, 0L, 48828L))
  }

  test("pack_stats corpus invariants: fills tile the corpus, overflow iff full, one row per pack") {
    val rows = SparkEntry.queries("pack_stats")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (_, n, fill, overflow, util) =>
      assert(n >= 1L && fill >= 1L)
      assert(util <= 1000000L)
      assert((overflow > 0L) == (fill > PostTrain.PackLen))
      if (overflow > 0L) assert(util == 1000000L)
    }
    // the packs partition the corpus: summed fills == summed conv lens
    val totalLen = SparkEntry.queries("sft_render")(spark, sfDir)
      .select($"conv_id", $"conv_len").distinct()
      .agg(sum($"conv_len")).head().getLong(0)
    assert(rows.map(_._3).sum == totalLen)
  }

  test("prm_pairs corpus invariants: siblings share the parent key, margins positive, group sizes in [2,3]") {
    val rows = SparkEntry.queries("prm_pairs")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (parent, n, chosen, rejected, cs, rs, margin) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))
      assert(chosen != rejected)
      assert((chosen - 1) / 3 == parent && (rejected - 1) / 3 == parent)
      assert(n >= 2L && n <= 3L) // a ternary tree has <= 3 siblings
      assert(margin == cs - rs && margin > 0L)
    }
  }

  test("refusal_detect: planted refusals gate; user-turn boilerplate never does") {
    import graft.operators.PostTrain
    val t = Seq(
      // conv 1: assistant refuses on turn 1, again on turn 3
      (1L, 0L, "user", "please do the thing"),
      (1L, 1L, "assistant", "I'm sorry, but I cannot help with that"),
      (1L, 2L, "user", "try anyway"),
      (1L, 3L, "assistant", "I must decline."),
      // conv 2: the USER says the boilerplate — must NOT gate
      (2L, 0L, "user", "as an AI, what would you do?"),
      (2L, 1L, "assistant", "here is a concrete plan that works"),
      // conv 3: clean, mixed case never matters (the (?i) flag)
      (3L, 0L, "user", "hi"),
      (3L, 1L, "assistant", "As An AI model I CANNOT do this"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = PostTrain.refusalDetect(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) == (4L, 2L, 2L, 1L, 0L))
    assert(out(2L) == (2L, 1L, 0L, -1L, 1L))
    assert(out(3L) == (2L, 1L, 1L, 1L, 0L))
    // corpus framing: the synthetic vocabulary carries no boilerplate,
    // so every conversation passes and the sentinel reads everywhere
    val corpus = SparkEntry.queries("refusal_detect")(spark, sfDir)
      .collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getAs[Long]("n_refusals") == 0L)
      assert(r.getAs[Long]("first_refusal_turn") == -1L)
      assert(r.getAs[Long]("keep_sft") == 1L)
    }
  }
}
