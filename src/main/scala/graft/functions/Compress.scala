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
  * `Expression` (the (b)-tier extension point): one static JNI-free call
  * per row inside whole-stage codegen, no UDF serialization, no
  * intermediate compressed buffer retained — only the LENGTH is
  * accumulated, so a 1 MB document costs one 8 KiB scratch buffer.
  *
  * Determinism: level is pinned (6) and the JDK's Deflater wraps the same
  * bundled zlib everywhere this engine runs, so the value is stable for a
  * given input across the cluster — but it is an IMPLEMENTATION-defined
  * length, not portable SQL, which is why the query built on it is
  * rows-only rather than DuckDB-oracle-checked (CompressSpec pins a
  * plain-Scala recompute instead).
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
  /** Deflated byte count at pinned level 6 (zlib-wrapped stream). Called
    * from generated code — keep the signature static-friendly. */
  def deflatedLength(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Column wrapper. */
  def deflateLen(c: Column): Column =
    ColumnBridge.column(DeflateLength(ColumnBridge.expression(c)))
}
