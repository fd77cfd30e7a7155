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
