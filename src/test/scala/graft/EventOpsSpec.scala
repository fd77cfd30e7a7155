package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-log training-pipeline operators: session-example assembly
  * (order-exact fingerprints), daily spike detection (median-based), and
  * cross-source quality calibration (within-source percentiles).
  */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeEvents(dir: String, rows: Seq[(Long, String, Long, String, Double, String)]): Unit =
    rows.map { case (id, ts, uid, et, v, p) =>
      (id, Timestamp.valueOf(ts), uid, et, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("session examples: 30-min gap splits sessions; fingerprint is " +
    "order-exact, not set-based") {
    val dir = TestSpark.tmpDir("sess")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", 7L, "a", 0.0, "{}"),
      (2L, "2024-01-01 10:10:00", 7L, "b", 0.0, "{}"),
      // 31-minute silence → new session
      (3L, "2024-01-01 10:41:00", 7L, "b", 0.0, "{}"),
      (4L, "2024-01-01 10:42:00", 7L, "a", 0.0, "{}")))
    val out = SparkEntry.queries("x_session_examples")(spark, dir)
      .orderBy("session_id").collect()
    assert(out.length == 2, "two sessions")
    val fps = out.map(_.getAs[String]("fp"))
    assert(fps(0) != fps(1),
      "sessions 'a,b' and 'b,a' hash differently — order matters")
    assert(out(0).getAs[Long]("n_events") == 2 &&
      out(0).getAs[Long]("span_us") == 600000000L)
  }

  test("event spikes: a planted 3× day is flagged, normal days are not") {
    val dir = TestSpark.tmpDir("spike")
    // 5 quiet days of 4 events + one day with 13 (13·2 > 4·5)
    val quiet = for {
      day <- 1 to 5; i <- 0 until 4
    } yield ((day * 100 + i).toLong, f"2024-01-0$day 0$i:00:00", i.toLong, "click", 0.0, "{}")
    val burst = (0 until 13).map(i =>
      ((600 + i).toLong, f"2024-01-06 ${i % 24}%02d:10:00", i.toLong, "click", 0.0, "{}"))
    writeEvents(dir, quiet ++ burst)
    val out = SparkEntry.queries("x_event_spikes")(spark, dir).collect()
      .map(r => r.getAs[Long]("c") -> r.getAs[Boolean]("spike")).toMap
    assert(out(13L), "burst day flagged")
    assert(!out(4L), "quiet days unflagged")
  }

  test("dataset card: dup_docs counts ALL members of duplicated groups; " +
    "top-lang ties break alphabetically") {
    val docs = Seq(
      // source A: 4 docs, one exact-dup pair (both members count), en/de tie
      (1L, "same text here", "en", "A", 14L),
      (2L, "same text here", "de", "A", 14L),
      (3L, "unique one alpha", "en", "A", 16L),
      (4L, "unique two beta", "de", "A", 15L),
      // source B: no dups, all fr
      (5L, "cinq six sept", "fr", "B", 13L),
      (6L, "huit neuf dix", "fr", "B", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.tmpDir("card")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x_dataset_card")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val a = rows("A")
    assert(a.getAs[Long]("n_docs") == 4 && a.getAs[Long]("dup_docs") == 2)
    assert(a.getAs[String]("top_lang") == "de",
      "2-2 en/de tie breaks to the alphabetically first lang")
    assert(a.getAs[Long]("top_lang_bp") == 5000)
    val b = rows("B")
    assert(b.getAs[Long]("dup_docs") == 0 &&
      b.getAs[String]("top_lang") == "fr" &&
      b.getAs[Long]("top_lang_bp") == 10000)
  }

  test("span corruption: mask accounting is consistent and the rate " +
    "lands near the 15% design point on the real corpus") {
    val rows = SparkEntry.queries("x_span_corruption")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var tok = 0L; var masked = 0L
    rows.foreach { r =>
      val (n, m, sp) = (r.getAs[Long]("n_tok"), r.getAs[Long]("n_masked"),
        r.getAs[Long]("n_spans"))
      assert(m <= n, "cannot mask more tokens than exist")
      // a reported span is a MAXIMAL masked run: overlapping/adjacent
      // 3-token gates merge into one longer span, so m can exceed 3·sp;
      // only the lower bound is structural (every span masks ≥1 token)
      assert(sp <= m, s"$sp spans cannot mask only $m tokens")
      assert((m == 0) == (sp == 0))
      tok += n; masked += m
    }
    val rateBp = masked * 10000 / tok
    assert(rateBp >= 500 && rateBp <= 3000,
      s"corpus mask rate ${rateBp}bp should straddle the ~15% design point")
    // determinism: same gates, same fingerprints
    val again = SparkEntry.queries("x_span_corruption")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("fp")).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getAs[String]("fp")))
  }

  test("hard negatives: one rank-1 positive per query, negatives only in " +
    "the 4..8 band, and the positive dominates every negative") {
    val rows = SparkEntry.queries("x_hard_negatives")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[String]("role"),
        r.getAs[Long]("rank"), r.getAs[Long]("dot_q")))
    assert(rows.nonEmpty)
    for ((_, grp) <- rows.groupBy(_._1)) {
      val pos = grp.filter(_._2 == "pos")
      assert(pos.length == 1 && pos.head._3 == 1L)
      val negs = grp.filter(_._2 == "neg")
      assert(negs.forall(n => n._3 >= 4 && n._3 <= 8),
        "ranks 2-3 are the excluded near-positive buffer")
      assert(negs.forall(_._4 <= pos.head._4))
    }
  }

  test("quality calibration: percentiles span 0..10000 within every " +
    "source and are monotone in the raw score") {
    val docs = (1 to 40).map { i =>
      val src = if (i % 2 == 0) "web" else "books"
      // distinct vocab sizes → strictly increasing entropy per source
      val text = (1 to (i / 2 + 2)).map(k => s"w$k").mkString(" ")
      (i.toLong, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.tmpDir("calib")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x_quality_calibration")(spark, dir)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("ent_bits"), r.getAs[Long]("pct_bp")))
    assert(rows.forall { case (_, _, p) => p >= 0 && p <= 10000 })
    for ((_, grp) <- rows.groupBy(_._1)) {
      val sorted = grp.sortBy(_._3)
      assert(sorted.map(_._2).sliding(2).forall(w =>
        w.length < 2 || w(0) <= w(1)),
        "pct_bp order respects ent_bits order")
      assert(sorted.head._3 == 0 && sorted.last._3 == 10000,
        "each source spans the full 0..10000 range")
    }
  }
}
