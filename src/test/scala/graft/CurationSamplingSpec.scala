package graft

import org.scalatest.funsuite.AnyFunSuite

/** Generative laws for the curation-sampling wave: the weighted subsample
  * takes exactly min(ceil(√n), n) docs per source with a re-run-stable
  * membership, and preference pairs match a plain-Scala recompute of the
  * rank-matched extreme-entropy pairing (strict margin, no self-pairs).
  */
class CurationSamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeDocs(dir: String,
                        rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, text, src) => (id, text, "en", src, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("weighted sample: exactly min(ceil(sqrt(n)), n) docs per source; " +
    "membership is stable under re-runs") {
    val dir = TestSpark.tmpDir("wsamp")
    // sources of size 1, 5, 10, 100 → caps 1, 3, 4, 10
    val rows = Seq(1 -> 1, 5 -> 2, 10 -> 3, 100 -> 4).flatMap {
      case (n, s) => (0 until n).map(i => ((s * 1000 + i).toLong, "w", s"s$s"))
    }
    writeDocs(dir, rows)
    def run() = SparkEntry.queries("x_sample_weighted")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = run()
    val bySrc = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc == Map("s1" -> 1, "s2" -> 3, "s3" -> 4, "s4" -> 10),
      s"per-source sample sizes: $bySrc")
    assert(run() == got, "hash-rank sample must be identical across runs")
  }

  test("preference pairs: equal a plain-Scala recompute of rank-matched " +
    "extremes; margins strictly positive; no doc paired with itself") {
    val dir = TestSpark.tmpDir("prefp")
    // entropy is driven by token multiset shape: k distinct tokens of one
    // occurrence each gives ent_bits = k*bitlen(k) - k*1; repeated single
    // token gives 0. Vary distinct-token counts per doc.
    def text(distinct: Int) = (0 until distinct).map(i => s"t$i").mkString(" ")
    val rows = Seq(
      (1L, text(1), "a"), (2L, text(2), "a"), (3L, text(4), "a"),
      (4L, text(8), "a"), (5L, text(16), "a"),
      (10L, text(3), "b"), (11L, text(3), "b")) // b: all-equal entropy
    writeDocs(dir, rows)

    def entBits(distinct: Int): Long = {
      val n = distinct.toLong
      n * java.lang.Long.toBinaryString(n).length - n * 1L
    }
    val ents = Map(1L -> entBits(1), 2L -> entBits(2), 3L -> entBits(4),
      4L -> entBits(8), 5L -> entBits(16))
    val sortedHi = ents.toSeq.sortBy { case (id, e) => (-e, id) }.map(_._1)
    val sortedLo = ents.toSeq.sortBy { case (id, e) => (e, id) }.map(_._1)
    val expected = (0 until 3).flatMap { i =>
      val (c, r) = (sortedHi(i), sortedLo(i))
      if (ents(c) > ents(r))
        Some(("a", (i + 1).toLong, c, r, ents(c) - ents(r)))
      else None
    }.toSet

    val got = SparkEntry.queries("x_preference_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // source b (all-equal entropy) must contribute NO pairs: every
    // candidate margin is 0, and the filter is strict
    assert(!got.exists(_._1 == "b"), s"tied source produced pairs: $got")
    assert(got == expected, s"got $got\nexpected $expected")
    got.foreach { case (_, _, c, r, m) =>
      assert(m > 0 && c != r, s"degenerate pair ($c, $r, margin $m)")
    }
  }
}
