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
}
