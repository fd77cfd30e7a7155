package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway local runner for iterating on a single query. */
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
    val docs = graft.io.Tables.table(spark, d, "documents")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    // warmup
    docs.count()

    val sh = docs.select(col("doc_id").as("doc"),
      explode(array_distinct(graft.operators.Dedup.shingles(col("text")))).as("sh"))
    time("explode_only")(sh.count())
    time("explode_1md5")(sh.select(col("doc"), md5(col("sh")).as("h")).count())
    time("explode_2md5")(sh.select(col("doc"),
      concat(md5(col("sh")), md5(concat(lit("#"), col("sh")))).as("h")).count())
    time("signature_16")(graft.operators.Dedup
      .minhashSignature(docs, "doc_id", "text").count())
    time("candidates")(graft.operators.Dedup
      .minhashCandidates(docs, "doc_id", "text").count())
    spark.stop()
  }
}
