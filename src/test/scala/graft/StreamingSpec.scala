package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables

/** Batch-parity of the streaming windowed aggregation: running the events
  * table through the AvailableNow stream + changelog compaction must equal
  * the plain batch groupBy — the same invariant the DuckDB oracle checks.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("windowed stream agg equals batch groupBy at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingSync
      .windowedEventCounts(spark, sf, windowMinutes = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap

    val ev = Tables.table(spark, sf, "events")
    val batch = ev
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(unix_micros(col("window.start")).as("w"), col("event_type"),
        col("n"), col("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap

    assert(streamed == batch)
  }

  test("incremental file sync appends exactly the delta on re-run") {
    import spark.implicits._
    val root = TestSpark.tmpDir("filesync")
    val src = s"$root/src"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.mode("append").parquet(src)
    assert(graft.streaming.StreamingSync
      .incrementalFileSync(spark, src, sink, ckpt) == 10)
    // no new files → nothing moves (the zero-delta short-circuit)
    assert(graft.streaming.StreamingSync
      .incrementalFileSync(spark, src, sink, ckpt) == 0)
    // two new source files → only the delta appends
    (11 to 15).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.mode("append").parquet(src)
    assert(graft.streaming.StreamingSync
      .incrementalFileSync(spark, src, sink, ckpt) == 5)
    assert(spark.read.parquet(sink).count() == 15)
  }

  test("mapGroupsWithState user rollup equals batch groupBy at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingSync.statefulUserRollup(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val batch = Tables.table(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"),
        unix_micros(max(col("ts"))).as("last_us"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(streamed == batch)
  }

  test("stream-static enrichment equals the batch join at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingSync.streamStaticEnrich(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val batch = Tables.table(spark, sf, "events")
      .join(Tables.table(spark, sf, "customer"),
        col("user_id") === col("c_custkey"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(streamed == batch)
  }

  test("stateful rollup NULL semantics match the batch aggregation: only " +
    "a null KEY drops the row") {
    import spark.implicits._
    val sf = TestSpark.tmpDir("nullev")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    Seq(
      (Option(1L), Option(1.0), Option(t1)),
      (Option(1L), Option.empty[Double], Option(t2)), // null value counts
      (Option(1L), Option(2.0), Option.empty[java.sql.Timestamp]), // null ts counts
      (Option.empty[Long], Option(9.0), Option(t1))) // null key drops
      .toDF("user_id", "value", "ts")
      .write.mode("overwrite").parquet(s"$sf/events.parquet")
    val out = graft.streaming.StreamingSync.statefulUserRollup(spark, sf)
      .collect()
    assert(out.length == 1, "only the non-null key survives")
    val r = out.head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 3, "count(*) semantics: null value/ts rows count")
    assert(r.getLong(2) == 300L, "sum skips the null value (neutral 0)")
    val expectedUs = Seq(t2).toDF("ts")
      .select(unix_micros(col("ts"))).head.getLong(0)
    assert(r.getLong(3) == expectedUs, "max ignores the null ts")
  }
}
