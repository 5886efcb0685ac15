package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared staging for store compaction (Fingerprints, GraphStore,
  * SearchIndex): write-new → swap → delete-old, with CRASH RECOVERY
  * so the "reader sees old or new, never half-written" contract
  * survives a process death between the two renames:
  *
  *   - `.sub.compact` leftover + live dir present → stale tmp from a
  *     crash BEFORE the swap window: delete the tmp, state is clean.
  *   - live dir ABSENT + `.sub.old` present → death INSIDE the swap
  *     window (old moved aside, new not yet moved in): restore the
  *     old dir first; the compaction then re-runs from a live state.
  *
  * Recovery runs at the START of every compact call, so one crashed
  * maintenance tick is healed by the next — no state is ever lost
  * (the pre-swap frame survives as `.old` until the new frame is in
  * place).
  *
  * All moves go through the HADOOP FileSystem resolved from the
  * store path itself (the AnnIndex.readServable discipline), not
  * java.io.File — the stores are written/read through Spark's Hadoop
  * layer, so a bundle on hdfs:// or s3a:// must compact through the
  * same API or compact silently no-ops (local-only `exists`) while
  * the 100 TB deployment the stores exist for runs remote. On
  * object stores without atomic rename the swap degrades to the
  * store's copy-based rename — slower, same old-or-new visibility
  * (the `.old` staging still heals a death mid-swap).
  */
private[sources] object StoreMaintenance {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The three staging paths for frame `sub` of the bundle at
    * `path`: (live, tmp, old). */
  private[sources] def staging(path: String, sub: String):
      (Path, Path, Path) =
    (new Path(s"$path/$sub"), new Path(s"$path/.$sub.compact"),
      new Path(s"$path/.$sub.old"))

  private[sources] def exists(spark: SparkSession, p: Path): Boolean =
    fs(spark, p).exists(p)

  /** Heal leftovers of a crashed previous compaction of `dir`. */
  private[sources] def recover(spark: SparkSession, dir: Path,
      tmp: Path, old: Path): Unit = {
    val f = fs(spark, dir)
    if (!f.exists(dir) && f.exists(old)) f.rename(old, dir)
    if (f.exists(tmp)) f.delete(tmp, true)
    if (f.exists(old)) f.delete(old, true)
    ()
  }

  /** Swap the freshly-written `tmp` in place of `dir` (which must
    * exist), staging the old frame aside until the new one is live. */
  private[sources] def swap(spark: SparkSession, dir: Path,
      tmp: Path, old: Path): Unit = {
    val f = fs(spark, dir)
    f.rename(dir, old)
    f.rename(tmp, dir)
    f.delete(old, true)
    ()
  }
}
