package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway local runner for iterating on a single query / plan audits.
  * Current use: scaling smoke — times key operators on 1x vs 8x corpus.
  * Replicas differ only in id (text/embeddings byte-identical), i.e. the
  * corpus becomes clusters of EXACT duplicates — the worst case for
  * pair-listing operators and the degenerate best case for exact dedup;
  * read the numbers with that in mind.
  */
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
    val emb = graft.io.Tables.table(spark, d, "embeddings")

    def rep(df: DataFrame, idCol: String, n: Int): DataFrame =
      (0 until n).map(i => df.withColumn(idCol,
        col(idCol) + lit(i.toLong * 10000000L))).reduce(_.unionByName(_))

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH $name%-26s $sec%8.2fs rows=$n")
      sec
    }

    docs.count(); emb.count() // warmup

    for (n <- Seq(1, 8)) {
      val dn = rep(docs, "doc_id", n)
      val en = rep(emb, "vec_id", n)
      time(s"exact_${n}x")(graft.operators.Dedup.exact(dn, "doc_id", "text").count())
      time(s"minhash_cand_${n}x")(graft.operators.Dedup
        .minhashCandidates(dn, "doc_id", "text").count())
      time(s"simhash_pairs_${n}x")(graft.operators.Dedup
        .simhashPairs(dn, "doc_id", "text", 4).count())
      time(s"embed_neardup_${n}x")(graft.operators.Dedup
        .embeddingNearDup(en, "vec_id", "embedding", "label", 0.35).count())
      graft.operators.Dedup.unpersistAll()
    }
    spark.stop()
  }
}
