package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus ingestion — the reference's dataset surface re-expressed.
  *
  * `readSectioned` mirrors `datasets/parse.py:20-31`: a line-oriented
  * corpus file is cut into fixed-size sections (default 10 lines, last
  * partial section kept) that become the pipeline's documents.
  * `readParallel` aligns a source/target file pair line-by-line the way
  * parse.py walks `src_lines`/`tgt_lines` together.
  *
  * Line indices come from `zipWithIndex` over the text RDD — a
  * deterministic global order for file sources — so sectioning is
  * reproducible across partitionings. At 100 TB the corpus is many
  * files; ordering stays per-file and the one shuffle is the section
  * groupBy.
  */
object Corpus {

  val SectionLines = 10

  /** (line_no, line) with a stable global order. */
  private def numberedLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.textFile(path).zipWithIndex()
      .map { case (line, i) => (i, line) }
      .toDF("line_no", "line")
  }

  /** doc_id, n_lines, text — fixed-size line sections as documents. */
  def readSectioned(spark: SparkSession, path: String,
      sectionLines: Int = SectionLines): DataFrame =
    numberedLines(spark, path)
      .withColumn("doc_id", (col("line_no") / sectionLines).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        array_join(transform(
          array_sort(collect_list(struct(col("line_no"), col("line")))),
          x => x.getField("line")), "\n").as("text"))

  /** doc_id, src_text, tgt_text — aligned parallel sections. */
  def readParallel(spark: SparkSession, srcPath: String, tgtPath: String,
      sectionLines: Int = SectionLines): DataFrame = {
    val src = readSectioned(spark, srcPath, sectionLines)
      .select(col("doc_id"), col("text").as("src_text"))
    val tgt = readSectioned(spark, tgtPath, sectionLines)
      .select(col("doc_id"), col("text").as("tgt_text"))
    src.join(tgt, "doc_id")
  }

  /** Sentence-boundary document splitting, mirroring the reference's
    * proactive partitioning (test_proactive.py:45-49, 192-199): the doc
    * is sentence-tokenized, `partition_size = n_sentences // num_steps`,
    * steps 0..num_steps-2 take `partition_size` sentences each and the
    * LAST step takes the remainder (`doc_prompts[i*ps:]`), partitions
    * re-joined with single spaces. Sentence tokenization stands in for
    * punkt (a trained model, not available here) with the deterministic
    * boundary rule "split after [.!?]+ followed by whitespace" — the
    * partition arithmetic is the reference's exactly, including
    * empty-string partitions when n_sentences < num_steps.
    *
    * Narrow plan: sentences never leave their row (split + slice on the
    * doc's own array), so the explode fans out num_steps rows per doc
    * with no shuffle anywhere.
    */
  def splitSentences(df: DataFrame, numSteps: Int): DataFrame = {
    require(numSteps > 0, "numSteps must be positive")
    val lastLen =
      greatest(col("n_sents") - col("ps") * (numSteps - 1), lit(0))
    df
      .withColumn("sents", split(col("text"), "(?<=[.!?])\\s+"))
      .withColumn("n_sents", size(col("sents")).cast("long"))
      .withColumn("ps", expr(s"n_sents DIV $numSteps"))
      .withColumn("step", explode(sequence(lit(0L), lit(numSteps - 1L))))
      .withColumn("part_text",
        when(col("step") === numSteps - 1,
          array_join(slice(col("sents"),
            (col("ps") * (numSteps - 1) + 1).cast("int"), lastLen.cast("int")), " "))
        .otherwise(
          array_join(slice(col("sents"),
            (col("step") * col("ps") + 1).cast("int"), col("ps").cast("int")), " ")))
      .select(col("doc_id"), col("step"), col("n_sents"), col("part_text"))
  }
}

/** JSONL results IO — the reference reads/writes line-delimited JSON
  * result files (compute_scores.py:23-25, the opus_outputs dir).
  */
object Jsonl {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
