package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HyperLogLog register aggregate — the TypedImperativeAggregate
  * twin of [[graft.operators.Sketches.approxDistinctHll]], bit-for-bit the
  * same registers and estimate (md5-prefix hash, m=256, integer-only
  * harmonic sum scaled by 2^20, alpha as the rational 7213/10000; see the
  * Sketches scaladoc for the math and the raw-regime caveat).
  *
  * Why a native aggregate when the relational form is already bounded: the
  * relational plan EXPLODES one (group, j, rho) row per input row into the
  * partial aggregate, so the map side hashes `rows` keys into a
  * `groups × 256`-entry hash table before the shuffle. This operator keeps
  * ONE 256-byte register buffer per group per partition (update = one md5 +
  * one byte-max, no per-row allocation), ships those buffers through the
  * partial/merge protocol (ObjectHashAggregate), and shuffles
  * `groups × 256 bytes` regardless of input size — at 100 TB the shuffle
  * and the map-side hash table shrink by the full row count. Merge is
  * elementwise byte max, so the aggregate is commutative/associative over
  * any partitioning.
  *
  * Returns a struct (n_reg, sum_scaled, hll_est) so callers can audit
  * register occupancy, mirroring the relational operator's output columns.
  */
case class HllRegisterAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val m = 256

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING child (cast the value first, like the " +
        s"relational operator's md5(cast(v AS string))), got $other")
  }

  override def prettyName: String = "hll_register_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val digest = HllRegisterAgg.md5.get()
    digest.reset()
    digest.update(v.asInstanceOf[UTF8String].getBytes)
    val d = digest.digest()
    // first 15 hex nibbles of the digest == (first 8 bytes as BE u64) >>> 4
    var h64 = 0L
    var i = 0
    while (i < 8) { h64 = (h64 << 8) | (d(i) & 0xffL); i += 1 }
    val h60 = h64 >>> 4
    val j = (h60 % m).toInt
    val w = h60 >>> 8
    val rho = if (w == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > buffer(j)) buffer(j) = rho.toByte
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if (other(j) > buffer(j)) buffer(j) = other(j)
      j += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    var nReg = 0L
    var sumScaled = 0L
    var j = 0
    while (j < m) {
      val mj = buffer(j)
      if (mj > 0) {
        nReg += 1
        val sh = 20 - mj
        sumScaled += (if (sh > 0) 1L << sh else 1L)
      } else sumScaled += 1L << 20
      j += 1
    }
    val est = (7213L * m * m * (1L << 20)) / (10000L * sumScaled)
    InternalRow(nReg, sumScaled, est)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = StructType(Seq(
    StructField("n_reg", LongType, nullable = false),
    StructField("sum_scaled", LongType, nullable = false),
    StructField("hll_est", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisterAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisterAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HllRegisterAgg =
    copy(child = newChild)
}

object HllRegisterAgg {
  // MessageDigest is stateful and not thread-safe; one per updater thread,
  // reset per row — no per-row allocation in the hot loop. Shared with the
  // CMS aggregate (same hash family).
  private[functions] val threadLocalMd5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private def md5 = threadLocalMd5

  /** Column wrapper: HLL register sketch of `value` (any type — cast to its
    * string form first, matching the relational operator's hash input).
    * Returns a struct (n_reg, sum_scaled, hll_est).
    */
  def hllSketch(value: Column): Column =
    ColumnBridge.column(
      HllRegisterAgg(ColumnBridge.expression(value.cast("string")))
        .toAggregateExpression())
}
