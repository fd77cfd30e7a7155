package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local runner for iterating on a single query / plan audits. */
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
    val d = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("x_dedup_minhash_lsh")(spark, d)
    df.count()
    val fin = df.queryExecution.executedPlan.toString
    println("REUSED_COUNT=" + "ReusedExchange".r.findAllIn(fin).length)
    println("SORTAGG_COUNT=" + "SortAggregate".r.findAllIn(fin).length)
    println("HASHAGG_COUNT=" + "HashAggregate".r.findAllIn(fin).length)
    spark.stop()
  }
}
