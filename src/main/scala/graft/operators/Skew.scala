package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4). AQE's skew-join handling
  * covers sort-merge joins at runtime; these helpers cover the cases
  * AQE doesn't: hot-key AGGREGATION and broadcast-averse skewed joins.
  */
object Skew {

  /** Two-level salted aggregation: `groupBy(keys).agg(sum(valueCol))`
    * where one key holds a large share of all rows. Level 1 aggregates
    * (key, salt) partials — hot keys fan out over `salts` reducers —
    * then level 2 combines the partials per key. Both shuffles carry
    * only partial rows; the hot key never lands on a single reducer
    * with its full row set.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
      salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted join of a skewed fact against a small-ish dim that is still
    * too big (or too dynamic) to broadcast: the dim side is replicated
    * `salts` times, the fact side gets a random-but-deterministic salt,
    * and the join key becomes (key, salt) — hot fact keys spread across
    * `salts` reducers.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts.toLong)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(explodedDim,
      saltedFact(key) === explodedDim(key) &&
        saltedFact("__salt") === explodedDim("__salt"))
      .drop(explodedDim(key)).drop("__salt")
  }
}
