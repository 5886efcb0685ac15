package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("id % 7 AS k").groupBy("k").count().collect()
    def time(label: String)(fn: => Unit): Unit = {
      val t0 = System.nanoTime(); fn
      println(f"TIMING $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val d = Tables(spark, sfDir, "documents")
    val slice10 = (c: org.apache.spark.sql.Column) =>
      slice(TextFns.tokens(TextFns.normalize(c)), 1, 10)
    val a = d.select(col("doc_id"), slice10(col("text")).as("pt"))
    val b = d.select((col("doc_id") - 1).as("doc_id"), slice10(col("text")).as("gt"))
    val pairs = a.join(b, "doc_id")
    time("pairs join") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    val sides = pairs.select(col("doc_id"), explode(array(
        struct(lit("p").as("side"), col("pt").as("toks")),
        struct(lit("g").as("side"), col("gt").as("toks")))).as("sd"))
      .select(col("doc_id"), col("sd.side").as("side"), col("sd.toks").as("toks"))
    val grams = sides
      .select(col("doc_id"), col("side"), col("toks"),
        explode(sequence(lit(1), lit(5))).as("n"))
      .filter(size(col("toks")) >= col("n"))
      .select(col("doc_id"), col("side"), col("n"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - col("n"))).as("i"))
      .select(col("doc_id"), col("side"), col("n"),
        array_join(slice(col("toks"), col("i") + 1, col("n")), " ").as("gram"))
    time("grams explode") {
      grams.write.format("noop").mode("overwrite").save()
    }
    val cnt = grams.groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(sum(when(col("side") === "p", 1L).otherwise(0L)).as("cp"),
        sum(when(col("side") === "g", 1L).otherwise(0L)).as("cg"))
    time("gram count") {
      cnt.write.format("noop").mode("overwrite").save()
    }
    time("full score_bleu") {
      SparkEntry.queries("score_bleu")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("full score_bleu 2") {
      SparkEntry.queries("score_bleu")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
