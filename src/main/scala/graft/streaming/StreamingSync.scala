package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming generalization of the reference's poll-based
  * incremental sync (SURVEY §2.9): the reference's high-watermark loop
  * (`WHERE ts >= max(ts)` re-polled externally, README.md:217-225) is exactly
  * Spark's file-source + watermark model, so the same events table can be
  * processed as a stream with `Trigger.AvailableNow` for batch-parity runs.
  *
  * Scale notes: the windowed aggregation is stateful but bounded by the
  * watermark horizon; state lives in the state store partitioned by group
  * key (shuffle.partitions shards), so 1000 executors each hold 1/1000 of
  * the key space. File sources scale by listing parallelism and
  * maxFilesPerTrigger batching.
  */
object StreamingSync {

  /** Tumbling-window aggregation over the events stream, run to completion
    * with AvailableNow and returned as a batch DataFrame (memory sink).
    * Output: window start (µs), event_type, exact count + cents sum.
    */
  def windowedEventCounts(spark: SparkSession, sfDir: String,
                          windowMinutes: Int = 5): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(batchSchema)
      .parquet(s"$sfDir/events.parquet")
    // ns-as-long restoration (see graft.io.Tables.table)
    val events =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("cents"))

    val name = s"graft_stream_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
