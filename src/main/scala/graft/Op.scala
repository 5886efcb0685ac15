package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One inventory row from SURVEY.md §2: a Spark query plus (when the
  * semantics are ANSI-expressible) a DuckDB oracle over the same tables.
  */
final case class Op(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Fns {
  /** Exact-decimal cast used before ANY sum/avg that the oracle compares.
    * Double summation order differs between engines (and between runs of a
    * parallel engine); summing exact decimals then casting the final value
    * to double is deterministic on both sides.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** SQL twin of [[dec]]. */
  def decSql(e: String): String = s"CAST($e AS DECIMAL(18,2))"

  def sumMoney(c: Column): Column = sum(dec(c)).cast("double")
  def sumMoneySql(e: String): String =
    s"CAST(SUM(${decSql(e)}) AS DOUBLE)"
}
