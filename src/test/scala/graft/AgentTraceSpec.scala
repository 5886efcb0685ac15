package graft

import graft.operators.AgentTrace

class AgentTraceSpec extends SparkSpec {
  import spark.implicits._

  private def trace(rows: (Long, Long, Long, String)*) =
    rows.toDF("trace_id", "event_id", "ts_us", "action")

  test("agent_trace: hand fixture — pairing identities, depth, error gate") {
    val t = trace(
      // trace 1 well-formed: nested pair inside a sequence, depth 2
      (1L, 1L, 100L, "user"), (1L, 2L, 200L, "call"),
      (1L, 3L, 300L, "result"), (1L, 4L, 400L, "call"),
      (1L, 5L, 500L, "call"), (1L, 6L, 600L, "result"),
      (1L, 7L, 700L, "result"), (1L, 8L, 800L, "assistant"),
      // trace 2: orphan result THEN a call — one unmatched result and
      // one dangling call even though the final balance is zero
      (2L, 1L, 100L, "result"), (2L, 2L, 200L, "call"),
      // trace 3: an error event poisons an otherwise-clean trace
      (3L, 1L, 100L, "user"), (3L, 2L, 200L, "error"),
      // trace 4: dangling call only
      (4L, 1L, 100L, "call"), (4L, 2L, 200L, "call"),
      (4L, 3L, 300L, "result"))
    val out = AgentTrace.agentTrace(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
      .sortBy(_._1)
    assert(out(0) == (1L, 8L, 3L, 3L, 0L, 2L, 0L, 0L, 1L))
    assert(out(1) == (2L, 2L, 1L, 1L, 0L, 0L, 1L, 1L, 0L))
    assert(out(2) == (3L, 2L, 0L, 0L, 1L, 0L, 0L, 0L, 0L))
    assert(out(3) == (4L, 3L, 2L, 1L, 0L, 2L, 0L, 1L, 0L))
  }

  test("agent_trace: input row order never matters (the window orders, not arrival)") {
    val ordered = trace((1L, 1L, 100L, "call"), (1L, 2L, 200L, "result"),
      (1L, 3L, 300L, "call"))
    val shuffled = trace((1L, 3L, 300L, "call"), (1L, 1L, 100L, "call"),
      (1L, 2L, 200L, "result"))
    val a = AgentTrace.agentTrace(ordered).collect().map(_.toSeq)
    val b = AgentTrace.agentTrace(shuffled).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("agent_trace corpus invariants: balance algebra ties the counters together") {
    val rows = SparkEntry.queries("agent_trace")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nEv, nCall, nRes, nErr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (depth, unmatched, dangling, ok) =
        (r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      assert(nCall + nRes + nErr <= nEv)
      // final balance identity: calls − results = dangling − unmatched
      assert(nCall - nRes == dangling - unmatched)
      assert(depth >= 0L && depth <= nCall)
      assert(unmatched >= 0L && unmatched <= nRes)
      assert(dangling >= 0L && dangling <= nCall)
      assert((ok == 1L) ==
        (unmatched == 0L && dangling == 0L && nErr == 0L))
    }
  }

  test("trace_bigram: hand fixture — start marker, per-source shares") {
    val t = trace(
      (1L, 1L, 100L, "user"), (1L, 2L, 200L, "call"), (1L, 3L, 300L, "call"),
      (2L, 1L, 100L, "user"), (2L, 2L, 200L, "result"))
    val out = AgentTrace.traceBigram(t).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("^", "user")) == (2L, 2L, 1000000L))
    assert(out(("user", "call")) == (1L, 2L, 500000L))
    assert(out(("user", "result")) == (1L, 2L, 500000L))
    assert(out(("call", "call")) == (1L, 1L, 1000000L))
    assert(out.size == 4)
  }

  test("trace_bigram corpus invariants: every event is one transition, shares tile each source row") {
    val rows = SparkEntry.queries("trace_bigram")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val nEvents = graft.Tables.events(spark, sfDir).count()
    assert(rows.map(_._2).sum == nEvents)
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val total = grp.head._3
      assert(grp.map(_._2).sum == total)
      val shareSum = grp.map(_._4).sum
      // DIV truncation loses < 1 ppm per row
      assert(shareSum > 1000000L - grp.length && shareSum <= 1000000L)
    }
  }

  test("tool_latency: hand fixture — forward match, open call, nested calls share the next result") {
    val t = trace(
      (1L, 1L, 100L, "call"), (1L, 2L, 250L, "result"),
      (1L, 3L, 300L, "call"), // trace ends open
      (2L, 1L, 10L, "call"), (2L, 2L, 20L, "call"),
      (2L, 3L, 30L, "result"), (2L, 4L, 40L, "result"))
    val out = AgentTrace.toolLatency(t).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(3), r.getLong(4))))
      .toMap
    assert(out((1L, 1L)) == (1L, 150L))
    assert(out((1L, 3L)) == (0L, -1L))
    // the NEXT-result contract (not stack matching): both nested calls
    // see the result at ts 30
    assert(out((2L, 1L)) == (1L, 20L))
    assert(out((2L, 2L)) == (1L, 10L))
    assert(out.size == 4)
  }

  test("trace_returns: hand fixture — discount weights, horizon truncation, trace-end zero fill") {
    val assistants = (1L to 10L).map(i => (1L, i, i * 100L, "assistant"))
    val t = trace(assistants ++ Seq(
      (2L, 1L, 100L, "call"), (2L, 2L, 200L, "assistant"),
      (2L, 3L, 300L, "error"), (2L, 4L, 400L, "user")): _*)
    val out = graft.operators.AgentTrace.traceReturns(t).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(4), r.getLong(5))))
      .toMap
    // trace 1: ten +1 rewards; the head's window holds only H=8 of
    // them — the full weight-table sum, not ten terms
    assert(out((1L, 1L)) == (1L, graft.operators.AgentTrace.GammaPpm.sum))
    // the last event's window is all beyond-trace-end zeros
    assert(out((1L, 10L)) == (1L, 1000000L))
    // trace 2: rewards [0, +1, -1, 0] -> hand-computed returns
    assert(out((2L, 1L)) == (0L, 900000L - 810000L))
    assert(out((2L, 2L)) == (1L, 1000000L - 900000L))
    assert(out((2L, 3L)) == (-1L, -1000000L))
    assert(out((2L, 4L)) == (0L, 0L))
    assert(out.size == 14)
  }

  test("trace_returns corpus invariants: one row per event, bounded returns, final-event identity") {
    val rows = SparkEntry.queries("trace_returns")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5)))
    assert(rows.nonEmpty)
    val nEvents = graft.Tables.events(spark, sfDir).count()
    assert(rows.length.toLong == nEvents)
    val wSum = graft.operators.AgentTrace.GammaPpm.sum
    rows.foreach { case (_, _, _, reward, ret) =>
      assert(reward >= -1L && reward <= 1L)
      assert(ret >= -wSum && ret <= wSum)
    }
    // the LAST event of every trace sees only beyond-end zeros:
    // its return is exactly 1e6 * its own reward
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val last = grp.maxBy(r => (r._3, r._2))
      assert(last._5 == 1000000L * last._4)
    }
  }

  test("tool_latency corpus invariants: one row per call, matched <=> nonneg latency") {
    val rows = SparkEntry.queries("tool_latency")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nCalls = graft.Tables.events(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("event_type") === "click")
      .count()
    assert(rows.length.toLong == nCalls)
    rows.foreach { r =>
      val (matched, lat) = (r.getLong(3), r.getLong(4))
      assert((matched == 1L) == (lat >= 0L))
    }
  }

  test("trace_loop: hand fixture — runs, interruption reset, tie-break, gate") {
    val t = trace(
      // trace 1: retry storm — five consecutive calls then one result
      (1L, 1L, 100L, "call"), (1L, 2L, 200L, "call"),
      (1L, 3L, 300L, "call"), (1L, 4L, 400L, "call"),
      (1L, 5L, 500L, "call"), (1L, 6L, 600L, "result"),
      // trace 2: clean alternation — max run 1 everywhere
      (2L, 1L, 100L, "call"), (2L, 2L, 200L, "result"),
      (2L, 3L, 300L, "call"), (2L, 4L, 400L, "result"),
      // trace 3: tie at run length 2 → run_action is the
      // lexicographically smallest of the tied actions ("call")
      (3L, 1L, 100L, "result"), (3L, 2L, 200L, "result"),
      (3L, 3L, 300L, "call"), (3L, 4L, 400L, "call"),
      // trace 4: interruption resets the run — 2+2 calls split by a
      // user turn is NOT a 4-run (the islands identity, not a count)
      (4L, 1L, 100L, "call"), (4L, 2L, 200L, "call"),
      (4L, 3L, 300L, "user"), (4L, 4L, 400L, "call"),
      (4L, 5L, 500L, "call"))
    val out = AgentTrace.traceLoop(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toMap
    assert(out(1L) == (6L, 2L, 5L, "call", 1L))
    assert(out(2L) == (4L, 4L, 1L, "call", 0L))
    assert(out(3L) == (4L, 2L, 2L, "call", 0L))
    assert(out(4L) == (5L, 3L, 2L, "call", 0L))
  }

  test("trace_loop: input row order never matters") {
    val rows = Seq((1L, 1L, 100L, "call"), (1L, 2L, 200L, "call"),
      (1L, 3L, 300L, "result"), (1L, 4L, 400L, "call"))
    val a = AgentTrace.traceLoop(trace(rows: _*)).collect().map(_.toSeq)
    val b = AgentTrace.traceLoop(trace(rows.reverse: _*)).collect()
      .map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("trace_loop corpus invariants: events tile into runs, gate == threshold") {
    val rows = SparkEntry.queries("trace_loop")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // one row per trace, and run lengths tile the trace's events
    val perTrace = graft.operators.AgentTrace.traceRows(
      graft.Tables.events(spark, sfDir))
      .groupBy("trace_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == perTrace.size)
    rows.foreach { case (id, nEvents, nRuns, maxRun, _, looping) =>
      assert(nEvents == perTrace(id))
      assert(nRuns >= 1L && nRuns <= nEvents)
      assert(maxRun >= 1L && maxRun <= nEvents)
      // pigeonhole: the longest run can't beat events per run count
      assert(maxRun <= nEvents - nRuns + 1L)
      assert((looping == 1L) ==
        (maxRun >= graft.operators.AgentTrace.LoopRunMin))
    }
  }
}
