package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Snapshots

/** Snapshot-diff laws: statuses are a pure function of (presence, content
  * equality), so the generative law recomputes them from the planted edit
  * script and demands exact equality.
  */
class SnapshotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("generative law: statuses equal the planted edit script") {
    val rnd = new scala.util.Random(59)
    (0 until 3).foreach { round =>
      // plant an edit script over 80 ids: each id independently lands in
      // one of the four statuses
      val script = (0 until 80).map { i =>
        (i.toLong, Seq("added", "removed", "changed", "unchanged")(rnd.nextInt(4)))
      }
      val oldRows = script.collect {
        case (id, "removed")   => (id, s"text-$id")
        case (id, "changed")   => (id, s"text-$id")
        case (id, "unchanged") => (id, s"text-$id")
      }
      val newRows = script.collect {
        case (id, "added")     => (id, s"text-$id")
        case (id, "changed")   => (id, s"text-$id EDITED")
        case (id, "unchanged") => (id, s"text-$id")
      }
      val got = Snapshots.corpusDiff(
        oldRows.toDF("doc_id", "text"), newRows.toDF("doc_id", "text"),
        "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == script.toMap, s"round $round diverged from edit script")
    }
  }

  test("null text hashes as empty: null->null is unchanged, null->text is " +
    "changed, and a null-text row is never misread as absent") {
    val old = Seq[(Long, String)]((1L, null), (2L, null), (3L, "x"))
      .toDF("doc_id", "text")
    val neu = Seq[(Long, String)]((1L, null), (2L, "now filled"), (3L, null))
      .toDF("doc_id", "text")
    val got = Snapshots.corpusDiff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"))
  }

  test("disjoint snapshots: everything old is removed, everything new is " +
    "added; empty snapshots diff to empty") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val neu = Seq((3L, "c")).toDF("doc_id", "text")
    val got = Snapshots.corpusDiff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "removed", 3L -> "added"))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Snapshots.corpusDiff(empty, empty, "doc_id", "text").count() == 0)
  }

  // ── corpusDrift ────────────────────────────────────────────────────────

  /** The metric, recomputed in plain Scala from first principles:
    * log2-length buckets (null → −1), cross-multiplied L1, integer ÷. */
  private def naiveDrift(old: Seq[(String, String)], neu: Seq[(String, String)])
      : Map[String, (Long, Long, Long)] = {
    def bucket(text: String): Int =
      if (text == null) -1
      else java.lang.Long.toBinaryString(text.length.toLong).length
    def hist(rows: Seq[(String, String)]) = rows
      .groupBy { case (s, t) => (if (s == null) "" else s, bucket(t)) }
      .map { case (k, v) => k -> v.size.toLong }
    val (ho, hn) = (hist(old), hist(neu))
    val srcs = (ho.keySet ++ hn.keySet).map(_._1)
    srcs.map { s =>
      val na = ho.collect { case ((`s`, _), c) => c }.sum
      val nb = hn.collect { case ((`s`, _), c) => c }.sum
      val buckets = (ho.keySet ++ hn.keySet).collect { case (`s`, b) => b }
      val l1 = buckets.toSeq.map { b =>
        math.abs(ho.getOrElse((s, b), 0L) * nb - hn.getOrElse((s, b), 0L) * na)
      }.sum
      s -> (na, nb,
        if (na == 0 || nb == 0) 10000L else l1 * 10000L / (na * nb))
    }.toMap
  }

  private def runDrift(old: Seq[(String, String)], neu: Seq[(String, String)])
      : Map[String, (Long, Long, Long)] =
    Snapshots.corpusDrift(old.toDF("source", "text"), neu.toDF("source", "text"),
      "source", "text")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("corpusDrift endpoints: identical shapes score 0, disjoint length " +
    "regimes score 20000, a vanished source scores the 10000 midpoint") {
    // identical histograms even though the actual documents differ
    val sameShape = runDrift(
      old = Seq(("a", "xx"), ("a", "yyyy")),
      neu = Seq(("a", "zz"), ("a", "wwww"), ("a", "qq"), ("a", "rrrr")))
    assert(sameShape("a") == ((2L, 4L, 0L)), s"got $sameShape")
    // old all short (bucket 2), new all long (bucket 5): no overlap
    val disjoint = runDrift(
      old = Seq(("a", "xx"), ("a", "yy")),
      neu = Seq(("a", "x" * 20)))
    assert(disjoint("a") == ((2L, 1L, 20000L)), s"got $disjoint")
    val vanished = runDrift(old = Seq(("gone", "xx")), neu = Seq(("kept", "xx")))
    assert(vanished("gone") == ((1L, 0L, 10000L)), s"got $vanished")
    assert(vanished("kept") == ((0L, 1L, 10000L)), s"got $vanished")
  }

  test("corpusDrift nulls: null source folds into the '' source and null " +
    "text occupies its own bucket") {
    val got = runDrift(
      old = Seq((null, "xx"), ("", null)),
      neu = Seq(("", "xx"), (null, null)))
    // both rows on each side land in source "": identical {bucket 2: 1,
    // bucket -1: 1} histograms → drift 0
    assert(got == Map("" -> ((2L, 2L, 0L))), s"got $got")
  }

  test("generative law: drift equals the plain-Scala recompute on random " +
    "planted corpora") {
    val rnd = new scala.util.Random(61)
    (0 until 3).foreach { round =>
      def corpus() = (0 until 120).map { _ =>
        val src = s"s${rnd.nextInt(4)}"
        val text =
          if (rnd.nextInt(10) == 0) null
          else "x" * (1 + rnd.nextInt(300))
        (src, text)
      }
      val (old, neu) = (corpus(), corpus())
      val got = runDrift(old, neu)
      val want = naiveDrift(old, neu)
      assert(got == want, s"round $round: $got != $want")
    }
  }

  test("cdcDiff: null-safe updates, change-sized output, and every op " +
    "carries the right before/after") {
    val v1 = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Option.empty[Long]),
      (4L, Some(40L)), (5L, Some(50L))).toDF("k", "v")
    val v2 = Seq((1L, Some(10L)),   // unchanged → NOT in the feed
      (2L, Option.empty[Long]),     // value→null is an UPDATE, not a miss
      (3L, Some(30L)),              // null→value is an UPDATE
      (5L, Some(55L)),              // plain update
      (9L, Some(90L)))              // insert; 4 deleted
      .toDF("k", "v")
    val got = Snapshots.cdcDiff(v1, v2, Seq("k"), "v").collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[String]("op"),
        Option(r.getAs[java.lang.Long]("before_v")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("after_v")).map(_.toLong))).toMap
    assert(got == Map(
      2L -> (("update", Some(20L), None)),
      3L -> (("update", None, Some(30L))),
      4L -> (("delete", Some(40L), None)),
      5L -> (("update", Some(50L), Some(55L))),
      9L -> (("insert", None, Some(90L)))), s"got $got")
    assert(!got.contains(1L), "unchanged keys must not enter the feed")
  }

  test("SCD2 history: runs collapse, changes open intervals, valid_to " +
    "chains exactly, ties break on the tie column, latest stays open") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      // user 1: A A B A — the repeat collapses, the return to A re-opens
      (1L, ts(1), "A", 10L), (1L, ts(2), "A", 11L),
      (1L, ts(3), "B", 12L), (1L, ts(4), "A", 13L),
      // user 2: same-timestamp tie — event_id order decides X then Y
      (2L, ts(5), "X", 21L), (2L, ts(5), "Y", 22L),
      // user 3: single event → one open interval
      (3L, ts(9), "Z", 30L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = graft.operators.Snapshots
      .scd2History(events, "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)),
        r.getBoolean(4)))
      .sortBy(r => (r._1, r._3.map(_.getTime),
        r._4.map(_.getTime).getOrElse(Long.MaxValue)))
    assert(out.toSeq == Seq(
      (1L, "A", Some(ts(1)), Some(ts(3)), false),
      (1L, "B", Some(ts(3)), Some(ts(4)), false),
      (1L, "A", Some(ts(4)), None, true),
      (2L, "X", Some(ts(5)), Some(ts(5)), false),
      (2L, "Y", Some(ts(5)), None, true),
      (3L, "Z", Some(ts(9)), None, true)),
      s"got:\n  ${out.mkString("\n  ")}")
    // interval-chain law: within a key, every valid_to equals the next
    // valid_from, and exactly one interval per key is open
    out.groupBy(_._1).foreach { case (k, ivs) =>
      assert(ivs.count(_._4.isEmpty) == 1, s"key $k open-interval count")
      ivs.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 == b._3, s"key $k chain broke")
        case _ =>
      }
    }
  }

  test("SCD2 change detection is null-safe: value→NULL opens a run, " +
    "consecutive NULLs collapse, NULL→value re-opens") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // the pre-fix form merged A→NULL into the A run (the =!= comparison
    // nulled out, chg fell to 0 and the NULL period vanished) and opened
    // a FRESH run on every consecutive NULL (lag IS NULL fired each time)
    val events = Seq(
      (1L, ts(1), "A", 10L), (1L, ts(2), null: String, 11L),
      (1L, ts(3), null: String, 12L), (1L, ts(4), "A", 13L),
      // key 2 STARTS null: first run is a NULL run, then a value
      (2L, ts(5), null: String, 20L), (2L, ts(6), "X", 21L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = graft.operators.Snapshots
      .scd2History(events, "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)),
        r.getBoolean(4)))
      .sortBy(r => (r._1, r._3.map(_.getTime)))
    assert(out.toSeq == Seq(
      (1L, Some("A"), Some(ts(1)), Some(ts(2)), false),
      (1L, None, Some(ts(2)), Some(ts(4)), false),
      (1L, Some("A"), Some(ts(4)), None, true),
      (2L, None, Some(ts(5)), Some(ts(6)), false),
      (2L, Some("X"), Some(ts(6)), None, true)),
      s"got:\n  ${out.mkString("\n  ")}")
  }
}
