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
}
