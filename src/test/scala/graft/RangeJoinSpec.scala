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

  test("intervalOverlapPairs: inclusive touch, emit-once across shared " +
    "buckets, key isolation, and empty intervals drop") {
    val w = 100L
    // intervals in raw units; width 100 so bucket edges sit at multiples
    val left = Seq(
      (1L, 1L, 50L, 250L),   // l1, key 1: spans buckets 0-2
      (1L, 2L, 400L, 410L),  // l2, key 1: isolated
      (2L, 3L, 50L, 250L),   // l3, key 2: same span, other key
      (1L, 4L, 300L, 200L))  // l4 INVERTED — no instants, must drop
      .toDF("k", "l_id", "l_lo", "l_hi")
    val right = Seq(
      (1L, 11L, 100L, 260L), // overlaps l1 in buckets 1 and 2 → ONE pair
      (1L, 12L, 250L, 300L), // touches l1's endpoint exactly → inclusive
      (1L, 13L, 251L, 300L), // just past l1 → no pair
      (1L, 14L, 0L, 500L),   // covers everything on key 1
      (2L, 15L, 240L, 240L)) // degenerate point inside l3
      .toDF("k", "r_id", "r_lo", "r_hi")
    val out = RangeJoin.intervalOverlapPairs(left, right, Seq("k"), w)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
    // emit-once: collect as a LIST and demand no duplicates
    assert(out.length == out.toSet.size,
      s"a pair surfaced in more than one bucket: ${out.toSeq.sorted}")
    // l1×{r11 overlap, r12 endpoint touch, r14 cover}; l2×r14 (key 1);
    // l3×r15 (degenerate point inside, key 2); l4 inverted → nothing
    assert(out.toSet == Set(
      (1L, 11L), (1L, 12L), (1L, 14L), (2L, 14L), (3L, 15L)),
      s"got ${out.toSeq.sorted}")
  }

  test("intervalOverlapPairs generative law: equals the naive quadratic " +
    "overlap filter on random interval sets") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val w = 100L
      def iv(): (Long, Long) = {
        val lo = rnd.nextInt(1000).toLong
        (lo, lo + rnd.nextInt(300))  // spans up to 4 buckets
      }
      val leftRows = for { k <- 1L to 3L; i <- 0 until rnd.nextInt(6) }
        yield { val (lo, hi) = iv(); (k, k * 100 + i, lo, hi) }
      val rightRows = for { k <- 1L to 3L; i <- 0 until rnd.nextInt(6) }
        yield { val (lo, hi) = iv(); (k, k * 1000 + i, lo, hi) }
      if (leftRows.nonEmpty && rightRows.nonEmpty) {
        val got = RangeJoin.intervalOverlapPairs(
          leftRows.toDF("k", "l_id", "l_lo", "l_hi"),
          rightRows.toDF("k", "r_id", "r_lo", "r_hi"), Seq("k"), w)
          .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
        val want = (for {
          (lk, lid, llo, lhi) <- leftRows
          (rk, rid, rlo, rhi) <- rightRows
          if lk == rk && llo <= rhi && rlo <= lhi
        } yield (lid, rid)).toSet
        assert(got.length == got.toSet.size, s"seed $seed: duplicates")
        assert(got.toSet == want,
          s"seed $seed:\n  got-only: ${(got.toSet -- want).take(5)}\n  " +
            s"want-only: ${(want -- got.toSet).take(5)}")
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
