package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** As-of join semantics on a hand-checkable fixture: most-recent-at-or-
  * before matching, `<=` boundary inclusion, per-key isolation, unmatched
  * lefts null, deterministic tie-break on equal right timestamps.
  */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2022-01-01 10:$m%02d:00")

  test("asofJoin picks the latest right row at or before each left row") {
    val left = Seq(
      (101L, 1L, ts(5)),   // after r1 → matches r1
      (102L, 1L, ts(10)),  // exactly at r2 → boundary counts
      (103L, 1L, ts(30)),  // after r2 and r3 → latest (r3)
      (104L, 2L, ts(10)),  // other key, no right rows → null
      (105L, 3L, ts(1)))   // before key-3's only right row → null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (201L, 1L, ts(2), 100.0),
      (202L, 1L, ts(10), 200.0),
      (203L, 1L, ts(20), 300.0),
      (204L, 1L, ts(10), 999.0), // same key+ts as 202 → greater id wins
      (205L, 3L, ts(50), 500.0))
      .toDF("event_id", "user_id", "ts", "amount")

    val out = AsOf.asofJoin(left, right, Seq("user_id"), "ts",
      "event_id", "event_id",
      Seq("cents" -> round(col("amount") * 100).cast("long")))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("asof_event_id")),
         Option(r.getAs[java.lang.Long]("asof_cents"))))
      .toMap

    assert(out(101L) == (Some(201L), Some(10000L)))
    assert(out(102L) == (Some(204L), Some(99900L)), "<= boundary, max-id tie-break")
    assert(out(103L) == (Some(203L), Some(30000L)))
    assert(out(104L) == (None, None), "key with no right rows")
    assert(out(105L) == (None, None), "left before first right row")
    assert(out.size == 5, "every left row survives exactly once")
  }

  test("generative law: both directions equal a naive per-key scan on " +
    "random data") {
    // Random left/right sets on a COARSE 7-slot time grid: equal-ts
    // boundary hits, duplicate right timestamps (the max-id dedup path),
    // keys with no right rows, and empty-side keys all occur constantly.
    // The naive replay implements the documented contract independently:
    // dedup right per (key, ts) by max id; backward = max ts <= l.ts,
    // forward = min ts >= l.ts.
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val leftRows = for {
        u <- 1L to 4L
        i <- 0 until rnd.nextInt(6)
      } yield ((u * 100 + i), u, ts(rnd.nextInt(7) * 5))
      val rightRows = for {
        u <- 1L to 4L if u != 2L // key 2 never has right rows
        i <- 0 until rnd.nextInt(6)
      } yield ((u * 1000 + i), u, ts(rnd.nextInt(7) * 5), rnd.nextInt(100).toDouble)
      if (leftRows.nonEmpty && rightRows.nonEmpty) {
        val left = leftRows.toDF("event_id", "user_id", "ts")
        val right = rightRows.toDF("event_id", "user_id", "ts", "amount")

        val deduped = rightRows.groupBy(r => (r._2, r._3.getTime))
          .map { case (_, rs) => rs.maxBy(_._1) }.toSeq
        def naive(forward: Boolean) = leftRows.map { case (lid, u, lts) =>
          val cands = deduped.filter(r => r._2 == u &&
            (if (forward) r._3.getTime >= lts.getTime
             else r._3.getTime <= lts.getTime))
          val pick =
            if (cands.isEmpty) None
            else Some(if (forward) cands.minBy(_._3.getTime)
                      else cands.maxBy(_._3.getTime))
          lid -> pick.map(r => (r._1, math.round(r._4 * 100)))
        }.toMap

        Seq(false, true).foreach { fwd =>
          val got = AsOf.asofJoin(left, right, Seq("user_id"), "ts",
            "event_id", "event_id",
            Seq("cents" -> round(col("amount") * 100).cast("long")),
            forward = fwd)
            .collect().map { r =>
              r.getAs[Long]("event_id") ->
                (Option(r.getAs[java.lang.Long]("asof_event_id")),
                  Option(r.getAs[java.lang.Long]("asof_cents")))
            }.toMap
          val want = naive(fwd).view.mapValues {
            case Some((id, c)) => (Some(id), Some(c))
            case None => (None, None)
          }.toMap
          assert(got == want,
            s"seed $seed forward=$fwd:\n  got-only: " +
              s"${(got.toSet -- want.toSet).take(3)}\n  want-only: " +
              s"${(want.toSet -- got.toSet).take(3)}")
        }
      }
    }
  }

  test("forward asofJoin picks the earliest right row at or after each left") {
    val left = Seq(
      (101L, 1L, ts(5)),   // before r1(ts 10) → matches r1
      (102L, 1L, ts(10)),  // exactly at r1 → boundary counts
      (103L, 1L, ts(25)),  // after every right row → null
      (104L, 2L, ts(1)))   // other key, no rights → null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (201L, 1L, ts(10), 100.0),
      (202L, 1L, ts(20), 200.0))
      .toDF("event_id", "user_id", "ts", "amount")
    val out = AsOf.asofJoin(left, right, Seq("user_id"), "ts",
      "event_id", "event_id",
      Seq("cents" -> round(col("amount") * 100).cast("long")),
      forward = true)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_event_id")))
      .toMap
    assert(out(101L) == Some(201L), "next right row after the left")
    assert(out(102L) == Some(201L), ">= boundary includes the equal-ts row")
    assert(out(103L) == None, "no later right row")
    assert(out(104L) == None, "key with no right rows")
  }

  test("a NULL value on the matched right row stays NULL (no backfill)") {
    val left = Seq((1L, 1L, ts(30))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (201L, 1L, ts(2), Some(100.0)),
      (202L, 1L, ts(20), None)) // matched row has a null amount
      .toDF("event_id", "user_id", "ts", "amount")
    val row = AsOf.asofJoin(left, right, Seq("user_id"), "ts",
      "event_id", "event_id",
      Seq("cents" -> round(col("amount") * 100).cast("long")))
      .collect().head
    assert(row.getAs[Long]("asof_event_id") == 202L)
    assert(row.isNullAt(row.fieldIndex("asof_cents")),
      "the matched row's NULL must not be backfilled from an older row")
  }
}
