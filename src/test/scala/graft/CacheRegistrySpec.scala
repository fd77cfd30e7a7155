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
}
