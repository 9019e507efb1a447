package graft.ext

import org.apache.spark.sql.DataFrame

/** Global registry for INNER persisted frames (shingle tables, signature
  * frames, feature tables) that live inside an operator's plan build.
  *
  * The operator memo caches (`Dedup.pairsCache` etc.) unpersist their
  * top-level frames on `clearMemos()`, but unpersisting a cached
  * DataFrame does NOT release persists nested inside its build — those
  * stayed registered in Spark's CacheManager, so a later identical
  * build would silently reuse warm blocks that a "cold" measurement
  * pass believed were dropped, and a long-lived session accumulated
  * dead caches per build. Routing every inner persist through
  * [[persistTracked]] lets the family `clearMemos()` hooks drain them
  * all (the registry is deliberately global: a cold-start sweep means
  * "no operator state anywhere", not "no state in this one file"). */
private[graft] object TrackedPersist {
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val invalidations =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  /** Persist MEMORY_AND_DISK and register for [[clear]] draining.
    * Designed for postfix use: `df.transform(TrackedPersist.persistTracked)`. */
  def persistTracked(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    live.add(df)
    df
  }

  /** Register a memo-map invalidation to run with every [[clear]].
    * Because the registry is global, one family's cold sweep drops
    * OTHER families' tracked blocks too; any memo cache whose cached
    * frame (or a dependency of it that is not independently
    * materialized) went through [[persistTracked]] would otherwise
    * keep serving a now-unpersisted frame that silently recomputes
    * its corpus-sized build on every action. Hooks must be pure map
    * clears — no unpersisting, and NEVER a call back into [[clear]]. */
  def onClear(hook: () => Unit): Unit = invalidations.add(hook)

  /** Unpersist every tracked frame (stopped-session frames throw —
    * swallowed; their blocks died with the session), then run the
    * registered memo invalidations so no cache outlives its blocks. */
  def clear(): Unit = {
    var d = live.poll()
    while (d != null) {
      try d.unpersist(blocking = false) catch { case _: Throwable => () }
      d = live.poll()
    }
    invalidations.forEach(h =>
      try h() catch { case _: Throwable => () })
  }
}
