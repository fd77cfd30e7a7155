package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving: maps an N-dimensional key to a single
  * integer whose sort order preserves multi-dimensional locality — ranges
  * of the z-value correspond to axis-aligned tiles of the key space. THE
  * layout trick for multi-dimension pruning at 100 TB: sort/partition the
  * table by z-value once, and range predicates on ANY of the interleaved
  * dimensions prune file-level min/max statistics (the same idea behind
  * Delta's OPTIMIZE ZORDER and parquet row-group skipping), instead of
  * only the leading sort column.
  *
  * Pure bit arithmetic (shifts, masks, adds) — codegen'd end-to-end and
  * expressible identically in any SQL dialect.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each dimension: bit `i` of
    * dimension `j` lands at position `i * dims + j`. Inputs must already
    * be non-negative and fit in `bits` bits (mod/clamp upstream).
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits * dims.size <= 63,
      s"z-value needs bits*dims <= 63, got $bits*${dims.size}")
    dims.zipWithIndex.flatMap { case (c, j) =>
      (0 until bits).map(i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * dims.size + j))
    }.reduce(_ + _).cast("long")
  }
}
