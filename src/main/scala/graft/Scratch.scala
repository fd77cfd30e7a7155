package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local runner for iterating on a single query / plan audits. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    spark.read.parquet(s"$d/events.parquet").count() // warmup

    // full streaming query
    time("stream_window_full")(
      graft.streaming.StreamingSync.windowedEventCounts(spark, d, 5).count())
    // second run in same session (stream machinery warm)
    time("stream_window_again")(
      graft.streaming.StreamingSync.windowedEventCounts(spark, d, 5).count())
    // with fewer shuffle partitions (state store instances)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("stream_window_8part")(
      graft.streaming.StreamingSync.windowedEventCounts(spark, d, 5).count())
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
