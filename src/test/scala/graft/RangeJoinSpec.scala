package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Bucketed range join on a hand-checkable fixture: window boundaries are
  * inclusive, keys isolate, and rows whose buckets differ but whose
  * timestamps are in range still match (the bucket-boundary case the
  * binning trick must not lose).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Int) = Timestamp.valueOf(
    f"2022-01-01 10:${sec / 60}%02d:${sec % 60}%02d")

  test("timeRangePairs finds exactly the in-window pairs") {
    // window: 60s before each left row
    val left = Seq((1L, 1L, ts(120)), (2L, 1L, ts(300)), (3L, 2L, ts(120)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (11L, 1L, ts(60)),   // exactly window start of l1 → inclusive
      (12L, 1L, ts(119)),  // in l1's window, different bucket than l1
      (13L, 1L, ts(121)),  // after l1, not in any window
      (14L, 1L, ts(300)),  // exactly l2's ts → inclusive
      (15L, 2L, ts(100)))  // key 2, in l3's window
      .toDF("event_id", "user_id", "ts")

    val out = RangeJoin.timeRangePairs(left, right, Seq("user_id"), "ts",
      "event_id", "event_id", beforeUs = 60000000L, afterUs = 0L)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id"))).toSet

    assert(out == Set((1L, 11L), (1L, 12L), (2L, 14L), (3L, 15L)))
  }

  test("generative law: bucketed pairs equal the naive quadratic filter " +
    "on random data") {
    // Random timestamps around bucket edges (multiples of the window
    // width ± small jitter) drive rows onto both sides of every bucket
    // boundary — the exact spots a binning bug would miss or double-count.
    // The independent truth is the literal quadratic definition.
    import spark.implicits._
    val before = 600L * 1000000L
    val after = 300L * 1000000L
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val width = before + after
      def randUs(): Long =
        (1 + rnd.nextInt(8)) * width + (rnd.nextInt(5) - 2) * (width / 4)
      val leftRows = for { u <- 1L to 3L; i <- 0 until rnd.nextInt(6) }
        yield (u * 100 + i, u, randUs())
      val rightRows = for { u <- 1L to 3L; i <- 0 until rnd.nextInt(6) }
        yield (u * 1000 + i, u, randUs())
      if (leftRows.nonEmpty && rightRows.nonEmpty) {
        val got = RangeJoin.timeRangePairs(
          leftRows.toDF("id", "user_id", "ts"),
          rightRows.toDF("id", "user_id", "ts"),
          Seq("user_id"), "ts", "id", "id", before, after)
          .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
          .toSet
        val want = (for {
          (lid, lu, lts) <- leftRows
          (rid, ru, rts) <- rightRows
          if lu == ru && rts >= lts - before && rts <= lts + after
        } yield (lid, rid)).toSet
        assert(got == want,
          s"seed $seed:\n  got-only: ${(got -- want).take(5)}\n  " +
            s"want-only: ${(want -- got).take(5)}")
      }
    }
  }

  test("Long epoch-us ts columns are used as-is (not reinterpreted as seconds)") {
    // same shape as above but ts already in µs-since-epoch longs
    val base = 1_640_995_200_000_000L // 2022-01-01 00:00:00 UTC in µs
    val left = Seq((1L, 1L, base + 120_000_000L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (11L, 1L, base + 60_000_000L),   // window start, inclusive
      (12L, 1L, base + 121_000_000L))  // after left, excluded
      .toDF("event_id", "user_id", "ts")
    val out = RangeJoin.timeRangePairs(left, right, Seq("user_id"), "ts",
      "event_id", "event_id", beforeUs = 60_000_000L, afterUs = 0L)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id"))).toSet
    assert(out == Set((1L, 11L)))
  }
}
