package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mixture-planning laws for x_mix_epochs: the ×10⁴ integer outputs equal
  * a plain-Scala recompute of the τ=2 temperature schedule, the √ weights
  * provably upsample the tail source past the 4-epoch data-constrained
  * cap, and a single-source corpus plans exactly one epoch.
  */
class MixEpochsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def text(n: Int) = Seq.fill(n)("tok").mkString(" ")

  private def run(sf: String): Map[String, (Long, Long, Long, Long, Boolean)] =
    SparkEntry.queries("x_mix_epochs")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))
      .toMap

  test("generative law: outputs equal the plain-Scala τ=2 recompute and " +
    "the tail source exceeds the 4-epoch cap") {
    val sf = TestSpark.tmpDir("mixsf")
    val docs =
      (0 until 990).map(i => (i.toLong, text(10), "en", "big", 0L)) ++
        (0 until 3).map(i => ((1000 + i).toLong, text(10), "en", "tiny", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")

    def isqrt(n: Long) = math.floor(math.sqrt(n.toDouble)).toLong
    val toks = Map("big" -> 9900L, "tiny" -> 30L)
    val wts = toks.view.mapValues(isqrt).toMap
    val wTotal = wts.values.sum
    val budget = toks.values.sum

    val out = run(sf)
    toks.foreach { case (s, n) =>
      val epochs = (budget * wts(s) / wTotal) * 10000 / n
      assert(out(s) == ((n, n * 10000 / budget, wts(s) * 10000 / wTotal,
        epochs, epochs > 40000)), s"source $s diverged: ${out(s)}")
    }
    // the schedule's point: √ temperature moves the tail ABOVE one epoch
    // (and past the over_cap guard here) while the head repeats below one
    assert(out("tiny")._4 > 10000 && out("big")._4 < 10000)
    assert(out("tiny")._5, "tail source should trip the 4-epoch cap")
    assert(!out("big")._5)
  }

  test("temperature mixing: α=½ flattens toward the tail (head share " +
    "shrinks, tail share grows vs raw) and w = ⌊√n⌋ exactly") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x_mix_temperature")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, w, _) =>
      assert(w * w <= n && n < (w + 1) * (w + 1), s"$lang: ⌊√$n⌋ != $w") }
    val totN = rows.map(_._2).sum
    val totW = rows.map(_._3).sum
    val head = rows.maxBy(_._2)
    val tail = rows.minBy(_._2)
    assert(head._2 > tail._2, "fixture must be skewed for this law")
    // α=½ compresses ratios: the head language's sampling share drops
    // below its raw corpus share, the tail language's rises above it
    assert(head._4 * totN < head._2 * 10000,
      s"head ${head._1}: temp share ${head._4}bp !< raw")
    assert(tail._4 * totN > tail._2 * 10000,
      s"tail ${tail._1}: temp share ${tail._4}bp !> raw")
    // shares are the exact integer division over the weight total
    rows.foreach { case (lang, _, w, bp) =>
      assert(bp == w * 10000 / totW, s"$lang share") }
  }

  test("single-source corpus plans exactly one epoch, uncapped") {
    val sf = TestSpark.tmpDir("mixone")
    Seq((1L, text(7), "en", "only", 0L), (2L, text(5), "en", "only", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val out = run(sf)
    assert(out == Map("only" -> ((12L, 10000L, 10000L, 10000L, false))))
  }
}
