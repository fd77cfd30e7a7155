package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for x_shard_rebalance: rendezvous hashing is CONSISTENT — growing
  * the shard set 8 → 10 only ever moves a doc TO one of the new shards
  * (8 or 9), never between surviving shards — and the query's aggregate
  * movement counts equal a plain-Scala recompute of the same HRW argmax.
  * Mod routing carries no such guarantee (its expected movement is
  * 1 - lcm-overlap ≈ 80%), which is the whole point of the audit.
  */
class ShardRebalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala mirror of the query's per-shard weight: first 12 hex
    * chars of md5("<id>:<s>") as a long, argmax by (weight, then SMALLER
    * shard id) — the struct (w, -s) max in both engines.
    */
  private def hrw(id: Long, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { s =>
      val hex = md.digest(s"$id:$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      (java.lang.Long.parseLong(hex, 16), -s)
    }.zipWithIndex.maxBy(_._1)._2
  }

  test("HRW consistency law + aggregate parity with the plain recompute") {
    val sf = TestSpark.tmpDir("shardsf")
    val ids = (0L until 500L)
    ids.map(i => (i, "doc text", "en", "src", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")

    // law 1: growing 8 → 10 only moves docs TO the new shards
    val badMoves = ids.filter { i =>
      val (a, b) = (hrw(i, 8), hrw(i, 10))
      a != b && b < 8
    }
    assert(badMoves.isEmpty,
      s"HRW relocated between surviving shards for ids: $badMoves")

    // law 2: the query's aggregate rows equal the recompute
    val out = SparkEntry.queries("x_shard_rebalance")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val hrwMoved = ids.count(i => hrw(i, 8) != hrw(i, 10)).toLong
    val modMoved = ids.count(i => i % 8 != i % 10).toLong
    assert(out == Map("hrw" -> ((500L, hrwMoved)), "mod" -> ((500L, modMoved))),
      s"got $out, expected hrw=$hrwMoved mod=$modMoved of 500")

    // the readout the audit exists for: HRW moves ~2/10 of the corpus,
    // mod moves the large majority
    assert(hrwMoved * 10 < 500L * 3, s"HRW moved $hrwMoved/500 — not ~2/10")
    assert(modMoved * 10 > 500L * 6, s"mod moved only $modMoved/500")
  }
}
