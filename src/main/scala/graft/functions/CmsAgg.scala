package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native count-min sketch aggregate — the TypedImperativeAggregate twin of
  * [[graft.operators.Sketches.cmsSketch]] with identical counters: depth=4
  * rows × width=1024 buckets addressed by disjoint 16-bit md5 chunks (hex
  * chars 4i+1..4i+4 of md5(value), i.e. digest bytes 2i,2i+1, mod width).
  *
  * The relational form EXPLODES four (i, bucket) rows per input value and
  * hash-aggregates them; this keeps one flat 4×1024 long array per
  * (group, partition) — update is one md5 + four increments, merge is
  * elementwise summation (the CMS merge law), and the shuffle carries a
  * fixed 32 KB buffer per partition instead of 4× the corpus row count.
  *
  * Returns the counters as a flat array<bigint> of length depth×width
  * (row-major: counter(i, b) at index i·width + b). Probing: either
  * `element_at` on the buffer directly, or posexplode the single row back
  * to the (i, bucket, cnt) relation and equi-join — the `x_freq_cms_native`
  * query does the latter, because a scalar-vs-relation join constant-folds
  * to a nested-loop plan while the flattened form stays a broadcast hash
  * join (the shape the 100 TB plan audit demands).
  */
case class CmsSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import CmsSketchAgg.{Depth, Width}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING child (cast the value first, matching " +
        s"the relational sketch's md5(value) input), got $other")
  }

  override def prettyName: String = "cms_sketch_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Depth * Width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val digest = HllRegisterAgg.threadLocalMd5.get()
    digest.reset()
    digest.update(v.asInstanceOf[UTF8String].getBytes)
    val d = digest.digest()
    var i = 0
    while (i < Depth) {
      // hex chars [4i+1, 4i+4] == bytes 2i, 2i+1 as a 16-bit BE int
      val chunk = ((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)
      buffer(i * Width + chunk % Width) += 1L
      i += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < buffer.length) { buffer(j) += other(j); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CmsSketchAgg {
  // must stay in lockstep with Sketches.CmsDepth/CmsWidth — the oracle SQL
  // and the relational operator address the same (i, bucket) coordinates
  val Depth: Int = graft.operators.Sketches.CmsDepth
  val Width: Int = graft.operators.Sketches.CmsWidth

  /** Column wrapper: flat depth×width CMS counter array of `value`. */
  def cmsSketch(value: Column): Column =
    ColumnBridge.column(
      CmsSketchAgg(ColumnBridge.expression(value.cast("string")))
        .toAggregateExpression())
}
