package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** plans/GraftExtensions: injected SQL functions + the VectorLoopRewrite
  * optimizer rule. The shared TestSpark session is built withExtensions,
  * so these tests exercise the exact wiring Verify/Bench run under.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1L, 2L, 3L)),
    (2L, Seq(4L, 5L, 6L)),
    (3L, Seq(-1L, 0L, 7L))).toDF("id", "v")

  /** Composed dot-product idiom over provably non-null long arrays. */
  private val composed =
    "aggregate(zip_with(a.v2, b.v2, (x, y) -> x * y), 0L, (s, x) -> s + x)"

  private def composedDf = {
    vecs.createOrReplaceTempView("ext_vecs")
    spark.sql(
      s"""WITH w AS (SELECT id, transform(v, e -> coalesce(e, 0L)) AS v2 FROM ext_vecs)
         |SELECT a.id AS ai, b.id AS bi, $composed AS dot
         |FROM w a JOIN w b ON a.id < b.id""".stripMargin)
  }

  test("VectorLoopRewrite collapses the composed idiom to dot_product_long") {
    val optimized = composedDf.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product_long"),
      s"rewrite did not fire; optimized plan:\n$optimized")
    assert(!optimized.contains("zip_with"),
      s"composed form survived the rewrite:\n$optimized")
  }

  test("rewritten results equal the hand-computed dot products") {
    val got = composedDf.orderBy("ai", "bi").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 32L), (1L, 3L, 20L), (2L, 3L, 38L)))
  }

  test("injected SQL function dot_product_long works and matches the rewrite") {
    vecs.createOrReplaceTempView("ext_vecs")
    val got = spark.sql(
      """SELECT a.id AS ai, b.id AS bi, dot_product_long(a.v, b.v) AS dot
        |FROM ext_vecs a JOIN ext_vecs b ON a.id < b.id
        |ORDER BY ai, bi""".stripMargin).as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 32L), (1L, 3L, 20L), (2L, 3L, 38L)))
  }

  test("injected SQL function squared_distance_long works") {
    val got = spark.sql(
      "SELECT squared_distance_long(array(1L, 2L), array(4L, 6L)) AS d")
      .as[Long].head()
    assert(got == 9L + 16L)
  }

  test("wrong-arity calls raise AnalysisException (WRONG_NUM_ARGS) like " +
    "every built-in, not a raw IllegalArgumentException") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product_long(array(1L))").collect()
    }
    assert(e.getMessage.contains("dot_product_long"), e.getMessage)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT deflate_length('a', 'b')").collect()
    }
  }

  test("rewrite does NOT fire on nullable-element arrays (padding semantics kept)") {
    // v is array<bigint> with containsNull=true straight off the Seq encoder?
    // Build one explicitly nullable via a CASE to be sure.
    vecs.createOrReplaceTempView("ext_vecs")
    val df = spark.sql(
      s"""WITH w AS (SELECT id, transform(v, e -> CASE WHEN e > 100 THEN NULL ELSE e END) AS v2 FROM ext_vecs)
         |SELECT a.id AS ai, b.id AS bi, $composed AS dot
         |FROM w a JOIN w b ON a.id < b.id""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("dot_product_long"),
      s"rewrite fired on nullable elements:\n$optimized")
  }

  test("ANSI overflow parity: the rewritten loop throws where the built-ins throw") {
    // Spark 4 defaults to ANSI mode, where the composed form raises on
    // overflow — the rewrite must not silently change that to wrapping
    vecs.createOrReplaceTempView("ext_vecs")
    val df = spark.sql(
      s"""WITH w AS (SELECT id,
         |  transform(v, e -> coalesce(e * 0L + 9223372036854775807L, 0L)) AS v2
         |  FROM ext_vecs)
         |SELECT a.id, $composed AS dot
         |FROM w a JOIN w b ON a.id = 1 AND b.id = 2""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("dot_product_long"),
      "rewrite did not fire on the overflow probe")
    val err = intercept[Exception](df.collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(c => c.isInstanceOf[ArithmeticException] ||
      c.getMessage != null && c.getMessage.contains("overflow")),
      s"expected overflow error, got: $err")
  }

  test("rewrite preserves NULL on unequal-length inputs (zip_with padding semantics)") {
    // zip_with pads the shorter array with NULLs, which poison the
    // multiply-fold — the composed form yields NULL. The rewritten
    // DotProductLong(nullOnMismatch=true) must reproduce that, not
    // truncate to the shorter vector: an optimizer rule may not change
    // results. (VERDICT r5 §wrong-2.)
    val uneven = Seq(
      (1L, Seq(1L, 2L, 3L)),
      (2L, Seq(4L, 5L))).toDF("id", "v")
    uneven.createOrReplaceTempView("ext_uneven")
    val df = spark.sql(
      s"""WITH w AS (SELECT id, transform(v, e -> coalesce(e, 0L)) AS v2 FROM ext_uneven)
         |SELECT a.id AS ai, b.id AS bi, $composed AS dot
         |FROM w a JOIN w b ON a.id < b.id""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("dot_product_long"),
      "rewrite did not fire on the unequal-length probe")
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.isNullAt(2),
      s"unequal-length dot must be NULL (composed-form parity), got: ${rows.toSeq}")
  }

  test("unequal-length inputs still throw on ANSI overflow in the " +
    "overlapping prefix (composed-form parity, the ADVICE r6 corner)") {
    // The composed form materializes zip_with's checked multiplies over
    // the overlapping prefix BEFORE the NULL padding poisons the fold, so
    // an overflow there throws even though the final result would be
    // NULL. The native loop must not short-circuit past it: it folds the
    // prefix first and nulls out after (VectorLoopExpression doc).
    import org.apache.spark.sql.graft.ColumnBridge
    val uneven = Seq(
      (1L, Seq(Long.MaxValue, 2L)),
      (2L, Seq(3L, 4L, 5L))).toDF("id", "v")
    def dotAnsi(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.DotProductLong(
        ColumnBridge.expression(a), ColumnBridge.expression(b),
        failOnError = true, nullOnMismatch = true))
    val joined = uneven.as("a").join(uneven.as("b"),
      col("a.id") < col("b.id"))
    val ex = intercept[Exception] {
      joined.select(dotAnsi(col("a.v"), col("b.v"))).collect()
    }
    def rootCauses(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: rootCauses(e.getCause))
    assert(rootCauses(ex).exists(_.isInstanceOf[ArithmeticException]),
      s"prefix overflow must throw ArithmeticException, got: $ex")
    // ...and with a non-overflowing prefix the same shape is NULL
    val ok = Seq((1L, Seq(1L, 2L)), (2L, Seq(3L, 4L, 5L))).toDF("id", "v")
    val rows = ok.as("a").join(ok.as("b"), col("a.id") < col("b.id"))
      .select(dotAnsi(col("a.v"), col("b.v"))).collect()
    assert(rows.length == 1 && rows.head.isNullAt(0),
      "mismatch without prefix overflow is NULL")
  }

  test("equal-length results are identical with the rewrite on and off") {
    val on = composedDf.orderBy("ai", "bi").as[(Long, Long, Long)].collect().toSeq
    spark.conf.set("spark.graft.rewriteVectorLoop", "false")
    val off =
      try composedDf.orderBy("ai", "bi").as[(Long, Long, Long)].collect().toSeq
      finally spark.conf.unset("spark.graft.rewriteVectorLoop")
    assert(on == off, s"rewrite changed results: on=$on off=$off")
  }

  test("conf flag spark.graft.rewriteVectorLoop=false disables the rewrite") {
    spark.conf.set("spark.graft.rewriteVectorLoop", "false")
    try {
      val optimized = composedDf.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("dot_product_long"),
        s"rewrite fired with the flag off:\n$optimized")
    } finally spark.conf.unset("spark.graft.rewriteVectorLoop")
  }
}
