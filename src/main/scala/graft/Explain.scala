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
          println(f"$name%-20s shuffles=$exchanges bhj=$bhj smj=$smj scans=$scans")
        } catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
