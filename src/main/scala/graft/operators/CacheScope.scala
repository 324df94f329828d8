package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Persist hygiene as an API contract (return-or-unpersist).
  *
  * Several operators persist intermediates as materialization barriers
  * (band signatures, IVF cell assignments) that the RESULT's lineage
  * still reads — unpersisting them before the caller's action would
  * re-trigger the recompute blowup the barrier exists to prevent (e.g.
  * 64× the md5 work in minhashLshPairs). With `cleanup = false`
  * (default — Verify/Bench clear the cache between queries) the frames
  * stay cached until the session clears them. With `cleanup = true` the
  * operator EAGERLY materializes its (persisted) result, frees every
  * intermediate immediately, and returns the cached result frame — the
  * ONLY surviving blocks; `unpersist()` it when done. A long-lived
  * production session therefore accumulates nothing it didn't ask for.
  */
private[graft] object CacheScope {

  /** Return `result` lazily (cleanup=false) or materialized-and-cached
    * with all `intermediates` freed (cleanup=true). */
  def scoped(result: DataFrame, intermediates: Seq[DataFrame],
      cleanup: Boolean): DataFrame =
    if (!cleanup) result
    else {
      val r = result.persist(StorageLevel.MEMORY_AND_DISK)
      r.count()
      intermediates.foreach(_.unpersist(false))
      r
    }
}
