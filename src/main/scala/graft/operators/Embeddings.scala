package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column toolbox beyond search: dimensionality reduction and
  * storage quantization — the two transforms a 100 TB embedding corpus hits
  * before anything else touches it (shrink the vectors, then shrink the
  * bytes). Companions to [[Similarity]] (which consumes their outputs) and
  * built on the same exactness discipline: floats become micro-unit longs
  * once ([[Similarity.quantize]]) and every downstream step is integer
  * arithmetic, so Spark partial aggregation and a SQL oracle agree
  * bit-for-bit.
  *
  * Scale shape: both operators are NARROW — pure per-row expression maps
  * with no shuffle, no UDF, and no state. On a 1000-executor cluster they
  * run at scan speed and stay inside whole-stage codegen; the only widths
  * in a real pipeline come from whatever aggregation the caller adds on
  * top.
  */
object Embeddings {

  /** Exact integer division for non-negative longs at the Column level
    * (the `div` operator exists only in SQL text): `a - (a mod b)` is an
    * exact multiple of `b`, and IEEE division of exact multiples below
    * 2^53 is exact, so the cast truncates nothing.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Deterministic ±1 sign for (input-dim i, output-dim j): popcount parity
    * of a murmur3-finalized mix of the two indices. NOT a plain XOR mix —
    * popcount parity of `a ^ b` factors into parity(a) XOR parity(b), which
    * would make every output dim the same row up to global sign (a rank-1,
    * useless projection); the multiply-shift finalizer breaks that
    * factorization. A pure compile-time function — the SAME literal table
    * is inlined into the Spark expression tree and the DuckDB oracle SQL,
    * so no cross-engine hash function needs to agree at runtime.
    */
  private[graft] def rpSign(i: Int, j: Int): Long = {
    var h = i * 73856093 + j * 19349663
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    if (java.lang.Integer.bitCount(h) % 2 == 0) 1L else -1L
  }

  /** The ±1 sign matrix for a `dims → outDims` projection, row = output dim. */
  private[graft] def rpSigns(dims: Int, outDims: Int): Seq[Seq[Long]] =
    Seq.tabulate(outDims)(j => Seq.tabulate(dims)(i => rpSign(i, j)))

  /** Sparse-free Achlioptas / Johnson–Lindenstrauss random projection:
    * reduce a quantized `dims`-vector to `outDims` integer components,
    * `y_j = Σ_i s(i,j)·vq_i` with the fixed ±1 matrix above. JL says
    * pairwise distances survive within (1±ε) at outDims = O(log n / ε²);
    * the ±1 (rather than Gaussian) matrix is the database-friendly variant
    * (Achlioptas 2003) because the projection is addition-only — here one
    * codegen'd `aggregate(zip_with(...))` per output dim, zero shuffles.
    *
    * Input column must already be micro-unit longs; output is an
    * `outDims`-long array column. Downstream: cheaper brute-force ANN,
    * LSH over fewer planes, or visualization exports.
    */
  def randomProject(vq: Column, dims: Int, outDims: Int): Column = {
    val signs = rpSigns(dims, outDims)
    array(signs.map { row =>
      aggregate(
        zip_with(vq, array(row.map(lit): _*), (x, sg) => x * sg),
        lit(0L), (acc, x) => acc + x)
    }: _*)
  }

  /** Symmetric per-vector int8 quantization, the storage format embedding
    * stores actually ship: scale m = max|v| (micro-units), code_i =
    * round(127·v_i / m) ∈ [-127, 127]. The round is done in pure integer
    * arithmetic — c = (|v|·254 + m) div (2m) is exact round-half-away-from-
    * zero for non-negative |v| — so no IEEE division can diverge between
    * engines. All-zero vectors quantize to all-zero codes with scale 0.
    *
    * Returns a struct column (scale_q, sum_err127, max_err127):
    * reconstruction error is reported in exact integer units of
    * micro-units×127 — err127_i = |127·v_i − code_i·m| — whose per-element
    * bound is m/2 (i.e. `2·max_err127 ≤ m`, pinned by spec). The error
    * rollup is what a quantization-quality audit reads; the codes
    * themselves are `int8Codes`.
    */
  def int8Stats(vq: Column): Column = {
    val m = array_max(transform(vq, v => abs(v)))
    val errs = transform(vq, { v =>
      val c = idiv(abs(v) * 254L + m, m * 2L)
      val rec = when(v < 0, -c * m).otherwise(c * m)
      when(m === 0L, 0L).otherwise(abs(v * 127L - rec))
    })
    struct(
      m.as("scale_q"),
      aggregate(errs, lit(0L), (acc, x) => acc + x).as("sum_err127"),
      array_max(errs).as("max_err127"))
  }

  /** The int8 code array itself (see [[int8Stats]] for the math). */
  def int8Codes(vq: Column): Column = {
    val m = array_max(transform(vq, v => abs(v)))
    transform(vq, { v =>
      val c = idiv(abs(v) * 254L + m, m * 2L)
      when(m === 0L, 0L).otherwise(when(v < 0, -c).otherwise(c))
    })
  }

  /** DuckDB-side rendering of the same sign matrix as a list-of-lists
    * literal (row = output dim j, 1-indexed by the caller's `[j]`).
    */
  private[graft] def rpSignsSql(dims: Int, outDims: Int): String =
    rpSigns(dims, outDims)
      .map(_.mkString("[", ",", "]")).mkString("[", ", ", "]")
}
