package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded registry of persisted intermediate tables (LSH band/signature
  * tables, iterated k-means assignments). Persisting is required where
  * Spark would otherwise recompute a shared subplan per self-join side or
  * per iteration (no ReusedExchange across a self-join — measured in round
  * 2); the registry caps how many such tables a long-lived library session
  * can retain: beyond `maxEntries` the oldest is unpersisted and evicted
  * (FIFO ≈ LRU for the build-once-reuse-soon pattern here), so storage
  * memory cannot leak without `unpersistAll` ever being called.
  */
private[graft] object CacheRegistry {
  // Sized so eviction only triggers in genuinely long-lived sessions:
  // evicting a table whose lazy consumer has not executed yet silently
  // restores the double-computation the persist prevents, so the bound is
  // a leak backstop, not a working-set size. r15: one full bench pass
  // registers MORE than the old cap of 64 distinct plans, so by the time
  // a query's rep 2 ran, FIFO had already unpersisted its table and every
  // rep paid the cold build again (x_dedup_semantic: 1.4 s CPU solo vs
  // 17 s in-suite — pure re-build churn, not data work). 256 covers the
  // whole suite's working set; every entry is MEMORY_AND_DISK, so the
  // backstop guards entry-count leaks, while MEMORY pressure is already
  // handled block-wise by Spark's storage eviction. Env-overridable for
  // re-measurement and for memory-constrained embedders.
  private val maxEntries =
    sys.env.get("SPARK_GRAFT_CACHE_MAX").map { s =>
      // fail fast with the env var's name: a bare toInt would throw a
      // context-free NumberFormatException at the first register() deep
      // inside a query build (ADVICE r15)
      require(s.matches("\\d+"),
        s"SPARK_GRAFT_CACHE_MAX must be a positive integer, got '$s'")
      s.toInt
    }.getOrElse(256)
  private val entries =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Register a persisted table, DEDUPING by analyzed-plan equality:
    * re-constructing the same operator in one session (a resident service
    * re-running a query; Bench's interleaved reps) re-persists an
    * identical plan, which Spark's CacheManager no-ops onto the existing
    * cache entry — but registering it again here would push an older
    * duplicate toward FIFO eviction, and unpersisting THAT drops the
    * SHARED cache entry out from under every later rep (measured r13:
    * interleaved bench reps thrashed x_dedup_clusters to
    * [3.16 s, 0.76 s, 3.28 s] — cold, warm, re-evicted-cold). A same-plan
    * registration now refreshes the existing entry's position instead of
    * adding a duplicate.
    */
  def register(df: DataFrame): DataFrame = entries.synchronized {
    val norm = df.queryExecution.analyzed
    val i = entries.indexWhere(_.queryExecution.analyzed.sameResult(norm))
    if (i >= 0) entries.remove(i) // re-append below: refresh, don't duplicate
    entries += df
    while (entries.length > maxEntries) {
      entries.remove(0).unpersist()
    }
    df
  }

  /** Eagerly unpersist one registered table and drop it from the registry.
    * Operators that can bound an intermediate's lifetime — an iteration
    * frame superseded by the next round, an edge table a checkpoint made
    * redundant — release in-function instead of leaning on FIFO eviction,
    * so repeated invocations in one session don't accumulate
    * MEMORY_AND_DISK entries.
    *
    * Lookup is by analyzed-plan `sameResult`, matching [[register]]'s
    * dedupe: `unpersist()` uncaches by PLAN, so a caller holding a
    * reference that a later same-plan registration deduped out must NOT
    * unpersist — that would drop the SHARED cache entry out from under the
    * live registrant (the r13 rep-thrash, moved to the release path).
    * A stale reference's release is therefore a no-op; only the live
    * registrant's release (or an unregistered frame's) unpersists.
    */
  def release(df: DataFrame): Unit = entries.synchronized {
    val norm = df.queryExecution.analyzed
    val i = entries.indexWhere(_.queryExecution.analyzed.sameResult(norm))
    if (i < 0) { df.unpersist(); return } // never registered: plain unpersist
    if (entries(i) eq df) {
      entries.remove(i)
      df.unpersist()
    } // else: a later same-plan registration owns the shared cache entry
  }

  /** Number of live registered tables (test observability). */
  private[graft] def entryCount: Int = entries.synchronized(entries.length)

  def unpersistAll(): Unit = entries.synchronized {
    entries.foreach(_.unpersist())
    entries.clear()
  }
}
