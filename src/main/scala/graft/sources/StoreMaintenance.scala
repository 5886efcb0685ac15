package graft.sources

/** Shared staging for store compaction (Fingerprints, GraphStore):
  * write-new → swap → delete-old, with CRASH RECOVERY so the
  * "reader sees old or new, never half-written" contract survives a
  * process death between the two renames:
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
  */
private[sources] object StoreMaintenance {

  private[sources] def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
  }

  /** Heal leftovers of a crashed previous compaction of `dir`. */
  private[sources] def recover(dir: java.io.File, tmp: java.io.File,
      old: java.io.File): Unit = {
    if (!dir.exists() && old.exists())
      java.nio.file.Files.move(old.toPath, dir.toPath)
    if (tmp.exists()) rm(tmp)
    if (old.exists()) rm(old)
  }

  /** Swap the freshly-written `tmp` in place of `dir` (which must
    * exist), staging the old frame aside until the new one is live. */
  private[sources] def swap(dir: java.io.File, tmp: java.io.File,
      old: java.io.File): Unit = {
    java.nio.file.Files.move(dir.toPath, old.toPath)
    java.nio.file.Files.move(tmp.toPath, dir.toPath)
    rm(old)
  }
}
