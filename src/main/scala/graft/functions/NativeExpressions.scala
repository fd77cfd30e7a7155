package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the quantized-vector hot path.
  *
  * The composed built-in form `aggregate(zip_with(a, b, _*_), 0, _+_)` is
  * codegen'd but materializes the zipped intermediate array per row and
  * runs the fold through per-element lambda plumbing; these expressions
  * `doGenCode` a single allocation-free loop over the two `ArrayData`
  * buffers (the (b)-tier extension point from the build rules: a native
  * `Expression` beats a UDF beats everything else). Semantics: inputs are
  * non-null-element long arrays (quantized vectors); length mismatch
  * truncates to the shorter input by default, or yields NULL when
  * `nullOnMismatch` is set — the latter reproduces the composed
  * `aggregate(zip_with(...))` built-in form (zip_with pads the shorter
  * array with NULLs, which poison the fold), and is what
  * [[graft.plans.VectorLoopRewrite]] uses so the optimizer rule never
  * changes results. Exactness on mismatched lengths includes the ANSI
  * corner: the composed form evaluates the checked arithmetic over the
  * overlapping prefix before the NULL padding nulls the fold, so an
  * overflow there throws — this loop therefore folds the prefix FIRST and
  * only then nulls out on mismatch (whether-it-throws is identical; only
  * the reported op may differ, since the built-in materializes every
  * product before any add while the loop interleaves them).
  *
  * `failOnError` mirrors the built-ins' overflow contract: when true
  * (ANSI sessions — the Spark 4 default) the loop uses
  * `Math.multiplyExact`/`addExact` and throws ArithmeticException on
  * overflow, exactly like the ANSI `*`/`+` it replaces; when false it
  * wraps (legacy semantics). The DataFrame-side wrappers default to
  * wrapping because the quantized-embedding path cannot overflow
  * (|x| ≤ 2e6, ≤ 4096 dims → |dot| < 2^63); the SQL-injected functions
  * and the VectorLoopRewrite rule derive it from the session/expression
  * they replace.
  */
abstract class VectorLoopExpression extends BinaryExpression {

  def failOnError: Boolean
  def nullOnMismatch: Boolean

  // the mismatch guard can null out a result even when both inputs are
  // non-null, so the expression must declare itself nullable in that mode
  override def nullable: Boolean = nullOnMismatch || super.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  /** Scala accumulation step for one element pair. */
  protected def step(acc: Long, x: Long, y: Long): Long
  /** Overflow-checked accumulation step. */
  protected def stepExact(acc: Long, x: Long, y: Long): Long
  /** Java source for the accumulation step over element vars `x`/`y`. */
  protected def stepCode(acc: String, x: String, y: String): String
  /** Java source for the overflow-checked step. */
  protected def stepCodeExact(acc: String, x: String, y: String): String

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    if (failOnError) {
      while (i < n) { s = stepExact(s, a.getLong(i), b.getLong(i)); i += 1 }
    } else {
      while (i < n) { s = step(s, a.getLong(i), b.getLong(i)); i += 1 }
    }
    // mismatch → NULL only AFTER the overlapping prefix has been folded:
    // the composed form it reproduces evaluates the (checked, under ANSI)
    // arithmetic over the prefix before the NULL padding poisons the fold,
    // so an ANSI overflow there must still throw, not be short-circuited
    if (nullOnMismatch && a.numElements() != b.numElements()) null else s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val body = if (failOnError) stepCodeExact(s, x, y) else stepCode(s, x, y)
      val loop =
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $x = $a.getLong($i);
           |  long $y = $b.getLong($i);
           |  $body
           |}
           |${ev.value} = $s;
         """.stripMargin
      // ev.isNull is only assignable when the expression is nullable, which
      // nullOnMismatch guarantees (see `nullable` above). The loop runs
      // BEFORE the mismatch guard for the same reason as in nullSafeEval:
      // ANSI overflow on the overlapping prefix must throw exactly like
      // the composed form it reproduces.
      if (nullOnMismatch) {
        s"""
           |$loop
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |}
         """.stripMargin
      } else loop
    })
}

/** Exact integer dot product of two quantized vectors. */
case class DotProductLong(left: Expression, right: Expression,
                          failOnError: Boolean = false,
                          nullOnMismatch: Boolean = false)
  extends VectorLoopExpression {
  override def prettyName: String = "dot_product_long"
  protected def step(acc: Long, x: Long, y: Long): Long = acc + x * y
  protected def stepExact(acc: Long, x: Long, y: Long): Long =
    Math.addExact(acc, Math.multiplyExact(x, y))
  protected def stepCode(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  protected def stepCodeExact(acc: String, x: String, y: String): String =
    s"$acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact($x, $y));"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact integer squared Euclidean distance between two quantized vectors. */
case class SquaredDistanceLong(left: Expression, right: Expression,
                               failOnError: Boolean = false,
                               nullOnMismatch: Boolean = false)
  extends VectorLoopExpression {
  override def prettyName: String = "squared_distance_long"
  protected def step(acc: Long, x: Long, y: Long): Long = {
    val d = x - y; acc + d * d
  }
  protected def stepExact(acc: Long, x: Long, y: Long): Long = {
    val d = Math.subtractExact(x, y)
    Math.addExact(acc, Math.multiplyExact(d, d))
  }
  protected def stepCode(acc: String, x: String, y: String): String =
    s"long __d = $x - $y; $acc += __d * __d;"
  protected def stepCodeExact(acc: String, x: String, y: String): String =
    s"long __d = java.lang.Math.subtractExact($x, $y); " +
      s"$acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact(__d, __d));"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeExpressions {
  /** Column wrapper: exact integer dot product (wrapping arithmetic — the
    * quantized path cannot overflow, see the class doc). */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: exact integer squared distance. */
  def squaredDistLong(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistanceLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
