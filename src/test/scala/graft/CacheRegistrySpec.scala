package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CacheRegistry dedupe contract (r13): re-registering the SAME plan —
  * what a resident service re-running an operator or Bench's interleaved
  * reps do — must refresh the existing entry, not append a duplicate.
  * Duplicates pushed older copies toward FIFO eviction, and unpersisting
  * an evicted duplicate drops the SHARED cache entry out from under every
  * later consumer (measured: interleaved bench reps thrashed
  * x_dedup_clusters cold→warm→cold again).
  */
class CacheRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same-plan re-registration refreshes instead of duplicating") {
    import graft.operators.CacheRegistry
    def build() = spark.range(10).select((col("id") * 2).as("v")).persist()
    val before = CacheRegistry.entryCount
    val a = CacheRegistry.register(build())
    assert(CacheRegistry.entryCount == before + 1)
    val b = CacheRegistry.register(build())
    assert(CacheRegistry.entryCount == before + 1,
      "identical plan must dedupe, not append")
    // the shared cache entry must still be live for the second consumer
    assert(b.queryExecution.optimizedPlan.toString.nonEmpty)
    assert(b.count() == 10)
    val c = CacheRegistry.register(
      spark.range(10).select((col("id") * 3).as("v")).persist())
    assert(CacheRegistry.entryCount == before + 2,
      "a genuinely different plan must append")
    CacheRegistry.release(a); CacheRegistry.release(b); CacheRegistry.release(c)
    assert(CacheRegistry.entryCount == before)
  }

  test("releasing a deduped-out stale reference must not uncache the live one") {
    import graft.operators.CacheRegistry
    import org.apache.spark.storage.StorageLevel
    def build() = spark.range(20).select((col("id") * 7).as("w")).persist()
    val before = CacheRegistry.entryCount
    val stale = CacheRegistry.register(build())
    val live = CacheRegistry.register(build()) // dedupes `stale` out
    assert(CacheRegistry.entryCount == before + 1)
    live.count() // materialize the shared cache entry
    assert(live.storageLevel != StorageLevel.NONE)
    // r14 contract: the stale ref's release is a no-op — unpersist() acts
    // by PLAN, so honoring it would drop the SHARED entry out from under
    // the live registrant (the r13 rep-thrash, moved to the release path)
    CacheRegistry.release(stale)
    assert(CacheRegistry.entryCount == before + 1,
      "stale release must not evict the live registrant")
    assert(live.storageLevel != StorageLevel.NONE,
      "stale release must not unpersist the shared cache entry")
    // the live registrant's own release still removes + unpersists
    CacheRegistry.release(live)
    assert(CacheRegistry.entryCount == before)
    assert(live.storageLevel == StorageLevel.NONE)
    // an unregistered frame's release is a plain unpersist (no crash)
    val free = spark.range(5).select((col("id") + 99).as("z")).persist()
    CacheRegistry.release(free)
    assert(free.storageLevel == StorageLevel.NONE)
    assert(CacheRegistry.entryCount == before)
  }
}
