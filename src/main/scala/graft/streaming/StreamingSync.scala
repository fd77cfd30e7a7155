package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming generalization of the reference's poll-based
  * incremental sync (SURVEY §2.9): the reference's high-watermark loop
  * (`WHERE ts >= max(ts)` re-polled externally, README.md:217-225) is exactly
  * Spark's file-source + watermark model, so the same events table can be
  * processed as a stream with `Trigger.AvailableNow` for batch-parity runs.
  *
  * Scale notes: the windowed aggregation runs in `update` output mode with a
  * watermark, so state is evicted once the watermark passes a window — state
  * is bounded by the watermark horizon, sharded across executors by group
  * key (shuffle.partitions). Each micro-batch's updated rows are APPENDED to
  * a parquet changelog sink tagged with the batch id (nothing is ever held
  * on the driver); readers compact the changelog with a last-writer-wins
  * window over batch_id — the same merge identity as graft.sync.Merge. File
  * sources scale by listing parallelism and maxFilesPerTrigger batching.
  */
object StreamingSync {

  /** Tumbling-window aggregation over the events stream, run to completion
    * with AvailableNow; the update-mode changelog is compacted on read-back.
    * Output: window start (µs), event_type, exact count + cents sum.
    */
  def windowedEventCounts(spark: SparkSession, sfDir: String,
                          windowMinutes: Int = 5): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema

    // Dirs are keyed by the SparkSession's applicationId: deterministic
    // within a run, unique across concurrent runs (no tmp-dir race), and
    // wiped per invocation so stale checkpoints can't mask new data.
    val base = s"${sys.props("java.io.tmpdir")}/graft_stream_" +
      spark.sparkContext.applicationId
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    // The file streaming source requires a DIRECTORY (a production table is
    // one); the test corpus ships single-file tables, so expose the file
    // through a per-run directory of symlinks.
    val eventsPath = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val streamDir =
      if (java.nio.file.Files.isDirectory(eventsPath)) eventsPath.toString
      else {
        val d = java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$base/src"))
        java.nio.file.Files.createSymbolicLink(
          d.resolve("events.parquet"), eventsPath)
        d.toString
      }
    val raw = spark.readStream.schema(batchSchema).parquet(streamDir)
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

    val sinkDir = s"$base/sink"
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(sinkDir)
        ()
      }
      .queryName("graft_stream_window_agg")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // Changelog compaction: last writer per group across micro-batches.
    val w = Window.partitionBy("win_start_us", "event_type")
      .orderBy(col("batch_id").desc)
    spark.read.parquet(sinkDir)
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .drop("__rn", "batch_id")
  }
}
