package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    docs.count() // warmup
    time("md5_only")(docs.select(md5(col("text")).as("h"))
      .where(col("h") =!= "").count())
    time("lower_only")(docs.select(md5(lower(col("text"))).as("h"))
      .where(col("h") =!= "").count())
    time("regex_fingerprint")(docs.select(
      graft.operators.TextAnalysis.fingerprint(col("text")).as("h"))
      .where(col("h") =!= "").count())
    time("exact_dedup_full")(graft.operators.Dedup
      .exact(docs, "doc_id", "text").count())
    spark.stop()
  }
}
