package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pairs of (left, right) rows under the same key
  * with `right.ts` inside `[left.ts - before, left.ts + after]`.
  *
  * A naive theta-join `ON r.ts BETWEEN l.ts - b AND l.ts + a` degenerates
  * to a per-key cross product (Spark plans it as a broadcast nested loop or
  * a cartesian filter). The scalable form here is the standard binning
  * trick: choose a bucket width >= the window span, explode each LEFT row
  * to the buckets its window can touch (a constant <= 2 + span/width of
  * them), equi-join on (key, bucket) — hash-partitioned, codegen'd — then
  * apply the exact range predicate. Output cardinality equals the true
  * match count; shuffle cardinality is O(|L| * buckets + |R|), never
  * |L| x |R|.
  */
object RangeJoin {

  /** `tsCol` is a timestamp column, or a Long column already holding
    * µs-since-epoch (a Long is used as-is — casting it through timestamp
    * would reinterpret it as seconds); `beforeUs`/`afterUs` bound the
    * window. Returns all matching pairs with both ids and both timestamps.
    */
  def timeRangePairs(left: DataFrame, right: DataFrame, keys: Seq[String],
                     tsCol: String, leftId: String, rightId: String,
                     beforeUs: Long, afterUs: Long): DataFrame = {
    val width = math.max(beforeUs + afterUs, 1L)
    val keyCols = keys.map(col)
    def usOf(df: DataFrame): Column =
      if (df.schema(tsCol).dataType ==
          org.apache.spark.sql.types.LongType) col(tsCol)
      else unix_micros(col(tsCol).cast("timestamp"))

    val l = left.select(
      keyCols :+ col(leftId).as("l_id") :+ usOf(left).as("l_us"): _*)
    val r = right.select(
      keyCols :+ col(rightId).as("r_id") :+ usOf(right).as("r_us"): _*)

    // buckets the left window [l_us - before, l_us + after] can touch;
    // exact integer division (timestamps are positive, so div == floor)
    val loBucket = expr(s"(l_us - ${beforeUs}L) div ${width}L")
    val hiBucket = expr(s"(l_us + ${afterUs}L) div ${width}L")
    val lB = l.withColumn("bucket", explode(sequence(loBucket, hiBucket)))
    val rB = r.withColumn("bucket", expr(s"r_us div ${width}L"))

    lB.join(rB, keys :+ "bucket")
      .where(col("r_us") >= col("l_us") - beforeUs &&
        col("r_us") <= col("l_us") + afterUs)
      .select(keyCols ++ Seq(col("l_id"), col("l_us"),
        col("r_id"), col("r_us")): _*)
  }

  /** Interval-overlap join: pairs of (left, right) rows under the same key
    * whose µs intervals [l_lo, l_hi] and [r_lo, r_hi] intersect
    * (`l_lo <= r_hi && r_lo <= l_hi`) — the interval×interval
    * generalization of [[timeRangePairs]] (whose right side is a point).
    *
    * Scale: BOTH sides explode to the width-`widthUs` buckets their
    * interval touches and equi-join on (key, bucket) — hash-partitioned,
    * codegen'd, never a per-key cross product. A pair that overlaps shares
    * every bucket in the intersection, so it would surface once per common
    * bucket; the emit-once rule keeps only the bucket containing
    * `max(l_lo, r_lo)` (overlap ⇒ `max(lo) <= min(hi)` ⇒ both intervals
    * touch that bucket, and exactly one bucket contains any instant) — a
    * per-row predicate, NO dedup shuffle. Replication factor is
    * 2 + span/width per row; size `widthUs` to the typical interval span.
    * Inputs must carry (keys, idCol, loUs, hiUs); empty intervals
    * (hi < lo) and NULL endpoints produce no pairs on either engine.
    */
  def intervalOverlapPairs(left: DataFrame, right: DataFrame,
                           keys: Seq[String], widthUs: Long): DataFrame = {
    require(widthUs > 0, "bucket width must be positive")
    val keyCols = keys.map(col)
    // drop inverted (empty) intervals BEFORE bucketing: Spark's `sequence`
    // DESCENDS when stop < start, which would fabricate buckets for an
    // interval that contains no instants
    val lB = left.where(col("l_hi") >= col("l_lo")).withColumn("bucket",
      explode(sequence(expr(s"l_lo div ${widthUs}L"),
        expr(s"l_hi div ${widthUs}L"))))
    val rB = right.where(col("r_hi") >= col("r_lo")).withColumn("bucket",
      explode(sequence(expr(s"r_lo div ${widthUs}L"),
        expr(s"r_hi div ${widthUs}L"))))
    lB.join(rB, keys :+ "bucket")
      .where(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi") &&
        col("bucket") === expr(s"greatest(l_lo, r_lo) div ${widthUs}L"))
      .select(keyCols ++ Seq(col("l_id"), col("l_lo"), col("l_hi"),
        col("r_id"), col("r_lo"), col("r_hi")): _*)
  }
}
