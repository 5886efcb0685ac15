package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of one query
  * (or shuffle/scan summaries for all). Usage:
  *   runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.nonEmpty && args(0) != "ALL") {
      SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    } else {
      // one-line shuffle/scan census per query
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val exchanges = "Exchange hashpartitioning|Exchange rangepartitioning"
            .r.findAllIn(plan).size
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
          val smj = "SortMergeJoin".r.findAllIn(plan).size
          val scans = "FileScan parquet".r.findAllIn(plan).size
          // join-shape early warnings. CartesianProduct is always a
          // bug here. BroadcastNestedLoopJoin is REPORTED, not
          // flagged: every legitimate one in this repo broadcasts a
          // bounded side (the 10-row ANN query set, 1-row counted
          // totals) — but an OR-of-equi-conditions or missing join
          // key ALSO lands here with a corpus-scale broadcast side
          // (the q36_triangles wedge-closure bug this census missed),
          // so any NEW bnlj in a diff demands a bounded-side argument.
          val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
          val cart = "CartesianProduct".r.findAllIn(plan).size
          val flag = (if (bnlj > 0) s" bnlj=$bnlj" else "") +
            (if (cart > 0) s" cartesian=$cart <-- QUADRATIC JOIN" else "")
          println(f"$name%-20s shuffles=$exchanges bhj=$bhj smj=$smj scans=$scans$flag")
        } catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
