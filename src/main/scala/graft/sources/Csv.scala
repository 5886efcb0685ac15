package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** src_csv_robust — delimited-text ingest that survives real-world
  * files (the reference consumes clean JSON/JSONL; every deployment
  * eventually receives CSV/TSV drops from a partner, and the naive
  * read either throws on row 40 million or silently nulls fields):
  *
  *   - PERMISSIVE parse with an explicit corrupt-record column: a row
  *     that fails the schema (bad type, wrong arity) lands WHOLE in
  *     `_corrupt` with the typed columns null — nothing throws, and
  *     the raw line is preserved for re-parse after the schema is
  *     fixed.
  *   - The caller's schema is REQUIRED (schema inference reads the
  *     whole input once before the real read — at 100 TB that is a
  *     second full scan; a declared schema also pins types against
  *     drift between drops).
  *   - `split` partitions the read into (good, quarantine) by the
  *     corrupt marker — the ingest_e2e audit philosophy: rejects
  *     leave WITH their evidence, never dropped silently.
  *
  * Scale notes: single-line mode keeps the read SPLITTABLE (Spark
  * assigns file ranges to tasks; `multiLine` forces one task per
  * file and is off here — quoted embedded newlines belong to the
  * producer contract, not the 100 TB read path). Quote/escape follow
  * RFC 4180 ("" inside quoted fields) so standard exporters parse
  * verbatim.
  */
object Csv {

  val CorruptCol = "_corrupt"

  /** Robust CSV read: `schema` describes the DATA columns; the
    * corrupt-record column is appended internally. header=true strips
    * a leading header line per file.
    */
  def readRobust(s: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame =
    s.read.format("csv")
      .option("header", "true")
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("quote", "\"")
      .option("escape", "\"")
      .schema(schema.add(CorruptCol, StringType))
      .load(path)

  /** (good, quarantine): good rows drop the marker column; quarantine
    * rows keep the raw line for re-parse. A row is quarantined iff
    * the parser recorded the raw line in the corrupt column.
    */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val good = df.where(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = df.where(col(CorruptCol).isNotNull)
    (good, bad)
  }
}
