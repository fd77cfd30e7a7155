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
  // a leak backstop, not a working-set size — 64 live lazily-planned LSH
  // queries in one session is already pathological.
  private val maxEntries = 64
  private val entries =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def register(df: DataFrame): DataFrame = entries.synchronized {
    entries += df
    while (entries.length > maxEntries) {
      entries.remove(0).unpersist()
    }
    df
  }

  def unpersistAll(): Unit = entries.synchronized {
    entries.foreach(_.unpersist())
    entries.clear()
  }
}
