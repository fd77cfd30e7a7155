package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.ColumnBridge

/** Column wrappers for Spark's native Bloom-filter expressions — the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair the optimizer's
  * own runtime-filter rule injects, exposed for EXPLICIT sketch-gated
  * operators (the rule only fires on join shapes it recognizes; a curation
  * pipeline wants the gate on its own terms).
  *
  * Why this matters at 100 TB: a Bloom filter over the SMALL side of a
  * membership question is a few MB of bits that broadcast to every
  * executor, so the 100 TB side is pruned AT THE SCAN — rows that cannot
  * match never enter the shuffle. False positives survive the gate and
  * are removed by the exact confirm downstream; false negatives do not
  * exist, so sketch-gated operators return EXACTLY the ungated result
  * (the equivalence law pinned in ContaminationSpec).
  *
  * Values are hashed to xxhash64 first — the probe must apply the
  * identical transform or every lookup misses (both wrappers hash
  * internally so callers cannot get this wrong).
  */
object Sketch {

  /** Aggregate a column of values into one serialized Bloom filter
    * (BinaryType). `expectedItems` sizes the filter; `numBits` bounds its
    * memory (m bits → fpp ≈ (1 - e^(-kn/m))^k with Spark's k = max(1,
    * m/n · ln 2)).
    */
  def bloomAgg(values: Column, expectedItems: Long = 1L << 20,
               numBits: Long = 1L << 23): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(values)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a serialized Bloom filter column. Never
    * false-negative; false positives at the filter's fpp.
    */
  def mightContain(bloom: Column, value: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        ColumnBridge.expression(bloom),
        ColumnBridge.expression(xxhash64(value))))
}
