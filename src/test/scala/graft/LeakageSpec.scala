package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-source leakage matrix laws, driven through the registered query
  * (the operator is a Pipeline-level composition, so the test goes through
  * the same entry the driver verifies).
  */
class LeakageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val sf = TestSpark.tmpDir("leaksf")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    sf
  }

  test("generative law: pair counts equal a plain-Scala recompute of " +
    "distinct shared lead-passage fingerprints") {
    val rnd = new scala.util.Random(83)
    val passages = Vector.tabulate(12)(i => s"lead passage $i " + ("x" * 250))
    (0 until 3).foreach { round =>
      val rows = (0 until 80).map { i =>
        // same 250+ char passage planted across random sources: the md5 of
        // the first 200 chars collides exactly when the passage id matches
        val p = passages(rnd.nextInt(passages.size))
        val tail = s" unique tail $i $round" // beyond char 200: must not matter
        (i.toLong, p + tail, "en", s"src${rnd.nextInt(5)}", (p + tail).length.toLong)
      }
      val expected = rows.map { case (_, text, _, src, _) =>
        (text.take(200), src)
      }.distinct
        .groupBy(_._1).values.flatMap { g =>
          val srcs = g.map(_._2).sorted
          for (a <- srcs; b <- srcs if a < b) yield (a, b)
        }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val sf = writeDocs(rows)
      val got = SparkEntry.queries("x_cross_source_leakage")(spark, sf)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got == expected, s"round $round diverged from recompute")
    }
  }

  test("no leakage when every source's passages are distinct; null text " +
    "and null source rows drop out instead of pairing") {
    val rows = Seq(
      (1L, "alpha " * 50, "en", "srcA", 300L),
      (2L, "beta " * 50, "en", "srcB", 250L),
      (3L, null.asInstanceOf[String], "en", "srcC", 0L),
      (4L, "gamma " * 50, "en", null.asInstanceOf[String], 300L))
    val sf = writeDocs(rows)
    assert(SparkEntry.queries("x_cross_source_leakage")(spark, sf).count() == 0)
  }
}
