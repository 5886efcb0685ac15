package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Training-shard sink (SURVEY.md §2 sources/sinks: sink_shards).
  *
  * The layout a training-data loader consumes: shard files of BOUNDED
  * record count, each holding a CONTIGUOUS run of the sort key (so a
  * curriculum/sequential reader streams shard-by-shard without a global
  * sort at read time, and a failed shard re-export touches one key
  * range). `repartitionByRange` gives non-overlapping key ranges per
  * output partition — one range shuffle, the same cost any total
  * ordering pays — `sortWithinPartitions` orders inside each, and
  * `maxRecordsPerFile` caps file size without another shuffle: Spark
  * rolls to a new file within the partition, so contiguity survives
  * the split. At 100 TB: nShards scales with the cluster (it is the
  * write parallelism), maxRecordsPerFile with the loader's memory.
  */
object Sinks {

  def writeShards(df: DataFrame, path: String, sortCol: String,
      nShards: Int, maxRecordsPerFile: Long): Unit =
    df.repartitionByRange(nShards, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(path)
}
