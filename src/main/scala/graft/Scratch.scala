package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local runner for iterating on a single query. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.streaming.StreamingSync.windowedEventCounts(
      spark, "/root/testdata/sf0.01", 5)
    df.show(5, truncate = false)
    println("SCRATCH_ROWS=" + df.count())
    spark.stop()
  }
}
