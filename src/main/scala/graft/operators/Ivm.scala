package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for keyed rollups built from MERGEABLE
  * aggregates (count/sum combine by SUM, min/max by themselves) — the
  * batch face of what the streaming twins do with state stores: a
  * materialized rollup over years of history is refreshed by aggregating
  * ONLY the delta and merging the two partial states, never rescanning
  * the history.
  *
  * Scale: this is the whole point — the merge's inputs are STATE-sized
  * (one row per key per state), so the refresh cost is
  * O(delta scan + state merge), independent of history size. avg/count
  * distinct are NOT mergeable in this representation — carry (sum, count)
  * or a sketch instead; the operator takes only columns whose combiner is
  * declared, so a non-mergeable measure can't slip through.
  */
object Ivm {

  /** Merge partial aggregation states sharing a schema: `sumCols` combine
    * by SUM (counts, sums), `maxCols` by MAX, `minCols` by MIN. Result ==
    * the rollup over the union of the states' source rows (the IVM law —
    * spec-pinned against a full recompute).
    */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String],
                  sumCols: Seq[String], maxCols: Seq[String],
                  minCols: Seq[String] = Nil): DataFrame = {
    require(states.nonEmpty, "need at least one partial state")
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c))
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
