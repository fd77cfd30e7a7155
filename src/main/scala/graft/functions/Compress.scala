package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-deflated byte length of a string's UTF-8 bytes — the primitive
  * behind compressibility-based quality filtering (highly repetitive or
  * templated text deflates far below natural prose; the classic
  * "compression ratio" heuristic of large-corpus curation). A native
  * `Expression` (the (b)-tier extension point): one static call per row
  * inside whole-stage codegen (Deflater is JNI-backed zlib — cheap, but
  * native; a thread-local instance is `reset()` between rows rather than
  * allocated/ended per row), no UDF serialization, no
  * intermediate compressed buffer retained — only the LENGTH is
  * accumulated, so a 1 MB document costs one 8 KiB scratch buffer.
  *
  * Determinism: level is pinned (6), so the value is stable for a given
  * input on a HOMOGENEOUS cluster (every executor running the same JDK
  * build's bundled zlib — the standard deployment). A mixed-JDK cluster
  * could see build-dependent lengths, which is exactly why the length is
  * treated as an IMPLEMENTATION-defined readout, not portable SQL: the
  * driver-checked queries expose only deterministic columns, and
  * CompressSpec pins a plain-Scala recompute of the length itself.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def prettyName: String = "deflate_length"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    GraftCompress.deflatedLength(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftCompress.deflatedLength($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftCompress {

  /** One Deflater + scratch buffer per executor thread, `reset()` between
    * rows. A Deflater holds a native zlib stream; allocating and `end()`ing
    * one per row is native churn inside the whole-stage-codegen loop. Task
    * threads are pooled and long-lived, so the leak-free pattern is a
    * thread-local that each call resets; the native stream is reclaimed by
    * the Cleaner when the pool thread dies.
    */
  private val localDeflater =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(6, false))
  private val localBuf =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  /** Deflated byte count at pinned level 6 (zlib-wrapped stream). Called
    * from generated code — keep the signature static-friendly. */
  def deflatedLength(bytes: Array[Byte]): Long = {
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = localBuf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column wrapper. */
  def deflateLen(c: Column): Column =
    ColumnBridge.column(DeflateLength(ColumnBridge.expression(c)))
}
