package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, EvalMode, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedExpression, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.{DotProductLong, SquaredDistanceLong}

/** Session extensions: the (c)-tier Catalyst integration point from the
  * build rules. Registers the native quantized-vector expressions as SQL
  * functions (so `spark.sql("... dot_product_long(a, b) ...")` works
  * without touching the Scala API) and installs [[VectorLoopRewrite]],
  * which transparently upgrades the composed built-in form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (s,x) -> s+x)` to the
  * allocation-free native loop.
  *
  * Install via `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.plans.GraftExtensions` — both
  * [[graft.LocalSession]] and the test session do the former, so every
  * verified query and spec runs under these extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductLongFn)
    ext.injectFunction(GraftExtensions.squaredDistanceLongFn)
    ext.injectFunction(GraftExtensions.deflateLengthFn)
    ext.injectOptimizerRule(_ => VectorLoopRewrite)
  }
}

object GraftExtensions {

  private def binary(name: String, clazz: Class[_],
                     build: (Expression, Expression) => Expression)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          org.apache.spark.sql.graft.ErrorsBridge
            .wrongNumArgs(name, 2, children.length)
        build(children.head, children(1))
      })

  /** `dot_product_long(array<bigint>, array<bigint>) -> bigint`. Built at
    * resolution time, so `SQLConf.get.ansiEnabled` reflects the session:
    * under ANSI the native loop overflow-checks like the built-ins it
    * replaces. */
  val dotProductLongFn = binary("dot_product_long", classOf[DotProductLong],
    (a, b) => DotProductLong(a, b,
      org.apache.spark.sql.internal.SQLConf.get.ansiEnabled))

  /** `squared_distance_long(array<bigint>, array<bigint>) -> bigint` */
  val squaredDistanceLongFn = binary("squared_distance_long",
    classOf[SquaredDistanceLong],
    (a, b) => SquaredDistanceLong(a, b,
      org.apache.spark.sql.internal.SQLConf.get.ansiEnabled))

  /** `deflate_length(string) -> bigint` — zlib-deflated byte count, the
    * compressibility-filter primitive (graft.functions.DeflateLength). */
  val deflateLengthFn
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("deflate_length"),
      new ExpressionInfo(classOf[graft.functions.DeflateLength].getName,
        "deflate_length"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          org.apache.spark.sql.graft.ErrorsBridge
            .wrongNumArgs("deflate_length", 1, children.length)
        graft.functions.DeflateLength(children.head)
      })

  /** Conf key gating [[VectorLoopRewrite]] (default on). */
  val RewriteConfKey = "spark.graft.rewriteVectorLoop"
}

/** Rewrites the composed dot-product idiom to [[DotProductLong]]:
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x) }}}
  *
  * becomes `dot_product_long(a, b)` whenever both inputs are
  * `array<bigint>` with provably non-null elements (`containsNull=false` —
  * e.g. built by `transform(..., v -> coalesce(cast(...), 0L))`). The
  * composed form materializes the zipped struct array per row and folds
  * through lambda plumbing; the native expression is one fused loop.
  *
  * The rewrite is exact, including the unequal-length edge: `zip_with`
  * pads the shorter input with NULLs, which poison the multiply-fold, so
  * the composed form yields NULL on UNEQUAL-length inputs — the replacement
  * is therefore built with `nullOnMismatch = true`, which makes the native
  * loop return NULL on a length mismatch too, and (the ANSI corner) folds
  * the overlapping prefix BEFORE nulling out, so a checked-arithmetic
  * overflow there throws exactly as the composed form would (see
  * [[graft.functions.VectorLoopExpression]]). An optimizer rule must never
  * change results; ExtensionsSpec pins the unequal-length case. The
  * `spark.graft.rewriteVectorLoop=false` escape hatch remains for plan
  * debugging only.
  */
object VectorLoopRewrite extends Rule[LogicalPlan] {

  private def nonNullLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  private def sameVar(use: Expression, arg: NamedExpression): Boolean =
    (use, arg) match {
      case (u: NamedLambdaVariable, a: NamedLambdaVariable) => u.exprId == a.exprId
      case _ => false
    }

  /** Both operands of a commutative op are exactly the two lambda args. */
  private def usesBoth(l: Expression, r: Expression,
                       a: NamedExpression, b: NamedExpression): Boolean =
    (sameVar(l, a) && sameVar(r, b)) || (sameVar(l, b) && sameVar(r, a))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(GraftExtensions.RewriteConfKey, "true").toBoolean) plan
    else plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      // overflow parity: the native loop inherits the matched arithmetic's
      // eval mode (Spark 4.1 carries it inside NumericEvalContext) — ANSI
      // `*`/`+` become an overflow-CHECKED loop (Math.multiplyExact /
      // addExact), legacy stays wrapping. TRY mode (null-on-overflow) has
      // no loop equivalent, so it is simply not rewritten.
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x, y, c1), Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(Add(s, e, c2), Seq(sa: NamedLambdaVariable, ea: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fa: NamedLambdaVariable), _))
        if c1.evalMode == c2.evalMode && c1.evalMode != EvalMode.TRY &&
          nonNullLongArray(a) && nonNullLongArray(b) &&
          usesBoth(x, y, xa, ya) && usesBoth(s, e, sa, ea) && sameVar(fin, fa) =>
        DotProductLong(a, b, failOnError = c1.evalMode == EvalMode.ANSI,
          nullOnMismatch = true)
    }
}
