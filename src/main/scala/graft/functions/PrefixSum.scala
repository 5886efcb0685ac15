package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-free global prefix sums (the packed-position / running-budget
  * primitive behind seq_pack and kv_cache_plan).
  *
  * A naive global running sum is a single-partition window over the
  * whole table; the old two-level scheme fixed that for the data rows
  * but still ran ONE single-partition window over the n/target
  * bucket-offset rows — linear in n, just with a smaller constant. This
  * is the recursion of that scheme, three levels deep:
  *
  *   1. in-bucket window     — partitioned, ~target rows per frame
  *   2. bucket offsets       — windowed WITHIN superbuckets of ~√B
  *      buckets each (partitioned, √B rows per frame)
  *   3. superbucket offsets  — the ONLY global window, over the ~√B
  *      superbucket rows
  *
  * With B ∝ n buckets, every frame is now O(target) or O(√(n/target)):
  * at 10¹² docs and target 1000, the global window sees ~31623 rows.
  * (Recursing further is possible but pointless below ~10¹⁸ rows.)
  * The B-row bucket-offset frame is joined back by SHUFFLE on the
  * bucket key the data is about to window-partition on anyway — never
  * broadcast (it grows ∝ n); only the √B superbucket offsets broadcast.
  */
object PrefixSum {

  /** Adds `out` = EXCLUSIVE prefix sum of `value` over rows ordered
    * globally by (`bkt`, orderInBkt...). The input must carry a `bkt`
    * column whose numeric order IS the global order; `numBuckets` is an
    * estimate of distinct `bkt` values (sizes the √B superbucket
    * grouping — an estimate only affects constants, not correctness).
    */
  def exclusive(df: DataFrame, value: String, orderInBkt: Seq[Column],
      numBuckets: Long, out: String): DataFrame = {
    val grp = math.max(math.ceil(math.sqrt(
      math.max(numBuckets, 1L).toDouble)).toLong, 1L)
    val bktSums = df.groupBy(col("bkt"))
      .agg(sum(col(value)).as("_bsum"))
      .withColumn("_sb", expr(s"CAST(bkt DIV $grp AS BIGINT)"))
    val inSbW = Window.partitionBy(col("_sb")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sbW = Window.orderBy(col("_sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sbOff = bktSums.groupBy(col("_sb"))
      .agg(sum(col("_bsum")).as("_sbsum"))
      .withColumn("_sboff", coalesce(sum(col("_sbsum")).over(sbW), lit(0L)))
      .select(col("_sb"), col("_sboff"))
    val offsets = bktSums
      .withColumn("_insb", coalesce(sum(col("_bsum")).over(inSbW), lit(0L)))
      .join(broadcast(sbOff), Seq("_sb"))
      .select(col("bkt"), (col("_sboff") + col("_insb")).as("_boff"))
    val inBktW = Window.partitionBy(col("bkt")).orderBy(orderInBkt: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.join(offsets, Seq("bkt"))
      .withColumn(out,
        col("_boff") + coalesce(sum(col(value)).over(inBktW), lit(0L)))
      .drop("_boff")
  }
}
