package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single most
  * recent right row with `right.ts <= left.ts` under the same key — the
  * standard feature/price/snapshot lookup of a training-data pipeline.
  *
  * Spark has no native ASOF JOIN, and the naive formulations both fail at
  * scale: a theta-join on `r.ts <= l.ts` explodes to a per-key cross
  * product before picking the max, and a broadcast only works for a tiny
  * right side. The composition here is the scalable form: UNION both sides
  * tagged, ONE window pass per key in event-time order carrying the latest
  * right values forward (`last(..., ignoreNulls)` — rows-between running
  * frame, codegen'd), then filter back to left rows. Cost: one shuffle of
  * (|L|+|R|) rows on the key, one sort within partitions — the same shape
  * as any windowed aggregation, with no pair explosion. Right rows are
  * deduplicated to one per (key, ts) — greatest id wins — so ties are
  * deterministic on both engines (DuckDB mirrors natively via
  * `ASOF LEFT JOIN`, which requires unique match points for determinism).
  */
object AsOf {

  /** Left rows keep (`leftId`, keys, ts); each gains the as-of `rightId`
    * and `rightVals` (null when no right row precedes it).
    *
    * `forward = true` flips the direction: the single EARLIEST right row
    * with `right.ts >= left.ts` (the "next snapshot" lookup — e.g. the
    * next price print after an order). Same union+window shape, traversed
    * in reverse event-time order; at equal ts the right row still
    * qualifies in both directions.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, leftId: String, rightId: String,
               rightVals: Seq[(String, Column)],
               forward: Boolean = false): DataFrame = {
    val keyCols = keys.map(col)

    // one right row per (key, ts): greatest id wins (deterministic ties)
    val wDedup = Window.partitionBy((keys :+ tsCol).map(col): _*)
      .orderBy(col("__r_id").desc)
    val r = right
      .select(keyCols ++ Seq(col(tsCol), col(rightId).as("__r_id")) ++
        rightVals.map { case (n, c) => c.as(s"__r_$n") }: _*)
      .withColumn("__rn", row_number().over(wDedup)).where(col("__rn") === 1)
      .drop("__rn")
      .withColumn("__l_id", lit(null).cast(left.schema(leftId).dataType))
      .withColumn("__is_left", lit(0))

    val l = left.select(keyCols :+ col(tsCol) :+ col(leftId).as("__l_id"): _*)
      .withColumn("__r_id", lit(null).cast(r.schema("__r_id").dataType))
      .select(r.columns.filter(c => c != "__rn").map {
        case c if c.startsWith("__r_") && c != "__r_id" =>
          lit(null).cast(r.schema(c).dataType).as(c)
        case "__is_left" => lit(1).as("__is_left")
        case c => col(c)
      }.toSeq: _*)

    // at equal ts, right rows sort first so `<=` semantics hold. The id and
    // all value columns are carried as ONE struct: carrying them with
    // independent last(ignoreNulls) calls would let a NULL value on the
    // matched row be silently backfilled from an older right row,
    // mispairing (id, value).
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(tsOrder, col("__is_left").asc,
        coalesce(col("__r_id"), col("__l_id")).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val rStruct = when(col("__is_left") === 0,
      struct(col("__r_id") +: rightVals.map { case (n, _) => col(s"__r_$n") }: _*))
    val carried = r.unionByName(l)
      .withColumn("__asof", last(rStruct, ignoreNulls = true).over(w))
    carried.where(col("__is_left") === 1)
      .select(keyCols ++ Seq(col("__l_id").as(leftId), col(tsCol),
        col("__asof.__r_id").as(s"asof_$rightId")) ++
        rightVals.map { case (n, _) => col(s"__asof.__r_$n").as(s"asof_$n") }: _*)
  }
}
