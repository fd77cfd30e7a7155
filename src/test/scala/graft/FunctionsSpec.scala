package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Functions

/** Scalar-function surface (SURVEY §2.8): lenient timestamp parsing against
  * the reference's fixture formats (my_orders.csv uses M/D/YYYY), exact
  * cents quantization, pg_size_pretty.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("touchNow rejects numeric last-modified columns (ambiguous epoch " +
    "units would silently break the sync watermark)") {
    import org.apache.spark.sql.functions.col
    val numericLm = Seq((1L, 946731600000000000L)).toDF("id", "lm")
    val ex = intercept[IllegalArgumentException] {
      graft.functions.Functions.touchNow(numericLm, "lm", col("id") === 1L)
    }
    assert(ex.getMessage.contains("ambiguous"), ex.getMessage)
    // ...and a typed timestamp column is accepted
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ok = graft.functions.Functions.touchNow(
      Seq((1L, ts), (2L, ts)).toDF("id", "lm"), "lm", col("id") === 1L)
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(ok(2L) == ts, "unmatched rows keep their stamp")
    assert(ok(1L).after(ts), "matched rows get the current clock")
  }

  test("bestEffortTimestamp parses the fixture formats, null on garbage") {
    val inputs = Seq(
      "2022-10-17 12:34:56",        // ISO datetime
      "2022-10-17 12:34:56.123456", // with micros
      "2022-10-17",                 // ISO date
      "10/17/2022",                 // the my_orders.csv M/D/YYYY form
      "1/3/2022 7:04:05",           // single-digit M/D H:m:s
      "not a date")
    val out = inputs.toDF("s")
      .select(date_format(Functions.bestEffortTimestamp(col("s")),
        "yyyy-MM-dd HH:mm:ss").as("p"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0).contains("2022-10-17 12:34:56"))
    assert(out(1).contains("2022-10-17 12:34:56"))
    assert(out(2).contains("2022-10-17 00:00:00"))
    assert(out(3).contains("2022-10-17 00:00:00"))
    assert(out(4).contains("2022-01-03 07:04:05"))
    assert(out(5).isEmpty, "garbage must parse to null, not throw")
  }

  test("cents: exact integer quantization survives double noise") {
    val out = Seq(19.99, 0.1 + 0.2, 100.005, -5.01).toDF("x")
      .select(Functions.cents(col("x")).as("c"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1999L, 30L, 10001L, -501L))
  }

  test("native dot/squared-distance expressions match the composed form") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Seq.fill(16)(rnd.nextLong() % 1000000L),
      Seq.fill(16)(rnd.nextLong() % 1000000L)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      graft.functions.NativeExpressions.dotLong(col("a"), col("b")).as("dot"),
      graft.functions.NativeExpressions.squaredDistLong(col("a"), col("b")).as("d2"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("dot_ref"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x).as("d2_ref")).collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(2), "dot parity with zip_with form")
      assert(r.getLong(1) == r.getLong(3), "dist parity with zip_with form")
    }
    // null input propagates null (BinaryExpression null-safety)
    val withNull = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(graft.functions.NativeExpressions.dotLong(col("a"), col("b")))
      .collect().head
    assert(withNull.isNullAt(0))
  }

  test("native minhash slot-mins match the composed transform(md5)+" +
    "aggregate+zip_with form (random shingles, unicode, empty-string " +
    "shingles, empty and null arrays)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val numHashes = 16
    val rnd = new scala.util.Random(13)
    // varying shingle counts per row; include unicode and empty-string
    // shingles (the digest runs over the same UTF-8 bytes on both sides)
    val rows = (0 until 120).map { i =>
      val k = 1 + i % 7
      (i.toLong, Seq.fill(k)(rnd.alphanumeric.take(12).mkString) ++
        (if (i % 5 == 0) Seq("héllo wörld", "") else Nil))
    }
    val df = rows.toDF("id", "sh")
    val composed =
      when(size(col("sh")) > 0, aggregate(
        transform(col("sh"),
          s => concat(md5(s), md5(concat(lit("#"), s)))),
        array((0 until numHashes).map(_ => lit(Int.MaxValue)): _*),
        (acc, x) => zip_with(acc,
          array((0 until numHashes).map(i =>
            conv(substring(x, 4 * i + 1, 4), 16, 10).cast("int")): _*),
          (a, b) => least(a, b))))
    val bad = df.select(
      graft.functions.NativeExpressions
        .minhashSlotsFromShingles(col("sh"), numHashes).as("native"),
      composed.as("ref"))
      .where(not(col("native") <=> col("ref"))).count()
    assert(bad == 0L, "native minhash slots != composed form")
    // a numSlots <= 8 signature skips the second digest — same prefix law
    val bad8 = df.select(
      graft.functions.NativeExpressions
        .minhashSlotsFromShingles(col("sh"), 8).as("native"),
      slice(composed, 1, 8).as("ref"))
      .where(not(col("native") <=> col("ref"))).count()
    assert(bad8 == 0L, "8-slot native minhash != composed prefix")
    // empty array → NULL (the folded-in size guard); null array → NULL
    val edge = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("id", "sh")
      .select(graft.functions.NativeExpressions
        .minhashSlotsFromShingles(col("sh"), numHashes).as("m"))
      .collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("native shingle-keys-60 match the composed array_distinct(" +
    "shingles)+md5-prefix-conv chain (random tokens, unicode, repeats, " +
    "short/empty/null arrays, null tokens)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(29)
    // small vocabulary so shingles REPEAT within a row (the distinct law
    // has something to remove); lengths span the <n single-shingle branch,
    // exactly-n, and long arrays; sprinkle unicode and null tokens
    val vocab = Vector("alpha", "beta", "gamma", "δelta", "ε", "")
    val rows: Seq[(Long, Seq[String])] = (0 until 150).map { i =>
      val len = i % 9 // 0..8 tokens
      val base0 = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      val toks = if (i % 7 == 0 && len > 0)
        base0.updated(rnd.nextInt(len), null: String)
      else base0
      (i.toLong, toks)
    }
    val df = rows.toDF("id", "toks")
    val composed = transform(
      array_distinct(graft.operators.Dedup.shinglesFromTokens(col("toks"))),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
    val bad = df.select(
      graft.functions.NativeExpressions.shingleKeys60(col("toks")).as("native"),
      composed.as("ref"))
      .where(not(col("native") <=> col("ref"))).count()
    assert(bad == 0L, "native shingle keys != composed form")
    // null ARRAY propagates null on both sides
    val edge = Seq((1L, Option.empty[Seq[String]]))
      .toDF("id", "toks")
      .select(graft.functions.NativeExpressions.shingleKeys60(col("toks")))
      .collect().head
    assert(edge.isNullAt(0))
  }

  test("native containment-runs match the composed sort+gaps-and-islands+" +
    "gate chain (random hit arrays, self-exclusion, threshold gate, " +
    "singleton and all-equal arrays)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(41)
    val thresholdE4 = 5000L
    // non-empty arrays (the operator invariant: collect_list ≥ 1) with
    // heavy repeats so runs form; self sometimes present, sometimes not;
    // k_probe in the operator's 1..8 range
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(40)
      val bs = Seq.fill(n)(rnd.nextInt(8).toLong)
      (i.toLong % 8, 1L + rnd.nextInt(8), bs)
    }
    val df = rows.toDF("a", "k_probe", "all_bs")
    val composed = df
      .withColumn("srt", array_sort(col("all_bs")))
      .withColumn("starts", filter(sequence(lit(1), size(col("srt"))),
        i => when(i === 1, lit(true)).otherwise(
          element_at(col("srt"), i) =!= element_at(col("srt"), i - 1))))
      .withColumn("ref", filter(
        transform(col("starts"), (s, j) => struct(
          element_at(col("srt"), s).as("b"),
          (coalesce(try_element_at(col("starts"), j + 2),
            size(col("srt")) + 1) - s).cast("long").as("n_match"))),
        r => r.getField("b") =!= col("a") &&
          r.getField("n_match") * lit(10000L) >=
            lit(thresholdE4) * col("k_probe")))
      .withColumn("native", graft.functions.NativeExpressions
        .containmentRuns(col("all_bs"), col("a"), col("k_probe"),
          thresholdE4))
    val bad = composed.where(not(col("native") <=> col("ref"))).count()
    assert(bad == 0L, "native containment runs != composed form")
    // null inputs propagate null (TernaryExpression null-safety)
    val edge = Seq((Option.empty[Seq[Long]], Some(1L), Some(2L)))
      .toDF("all_bs", "a", "k_probe")
      .select(graft.functions.NativeExpressions
        .containmentRuns(col("all_bs"), col("a"), col("k_probe"), 0L))
      .collect().head
    assert(edge.isNullAt(0))
  }

  test("VecSum aggregates vectors elementwise, exactly, per group") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1L, 2L, 3L)), ("a", Seq(10L, 20L, 30L)),
      ("b", Seq(-5L, 0L, 5L)))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(graft.functions.VecSum.vecSum(org.apache.spark.sql.functions.col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == Seq(11L, 22L, 33L))
    assert(out("b") == Seq(-5L, 0L, 5L))
    // partial/merge path: many partitions, one group
    val big = (1 to 1000).map(i => ("g", Seq(i.toLong, 1L))).toDF("g", "v")
      .repartition(8)
    val s = big.groupBy("g")
      .agg(graft.functions.VecSum.vecSum(org.apache.spark.sql.functions.col("v")))
      .collect().head.getSeq[Long](1)
    assert(s == Seq(500500L, 1000L))
    // null vectors are the sum's neutral element — including partitions
    // whose rows are ALL null (empty partial meets non-empty in merge)
    val withNulls = (
      (1 to 8).map(i => ("g", Option(Seq(i.toLong)))) ++
        Seq.fill(8)(("g", Option.empty[Seq[Long]])))
      .toDF("g", "v").repartition(4, org.apache.spark.sql.functions.col("v"))
    val ns = withNulls.groupBy("g")
      .agg(graft.functions.VecSum.vecSum(org.apache.spark.sql.functions.col("v")))
      .collect().head.getSeq[Long](1)
    assert(ns == Seq(36L), "null rows skipped, empty partials merge cleanly")
  }

  test("VecSumAgg (native) == VecSum (udaf law twin) on every shape: " +
    "groups, partial/merge across partitions, null rows, all-null group " +
    "to NULL — and its plans canonicalize (sameResult) where the udaf's " +
    "never did, which is what makes cache dedupe work for k-means rounds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = ((1 to 100).map(i => (i % 5, Option(Seq(i.toLong, -i.toLong, 7L)))) ++
      Seq((7, Option.empty[Seq[Long]]), (7, Option.empty[Seq[Long]])))
      .toDF("g", "v").repartition(6)
    def agg(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      df.groupBy("g").agg(fn(col("v")).as("s"))
        .collect().map(r => r.getInt(0) -> Option(r.getSeq[Long](1))).toMap
    val native = agg(graft.functions.VecSumAgg.vecSum)
    val law = agg(graft.functions.VecSum.vecSum)
    assert(native == law, "native aggregate diverges from the udaf law twin")
    assert(native(7).isEmpty, "all-null group must finish NULL")
    // the property the swap exists for: rebuilt identical plans dedupe
    def plan() = df.groupBy("g")
      .agg(graft.functions.VecSumAgg.vecSum(col("v")).as("s"))
      .queryExecution.analyzed
    assert(plan().sameResult(plan()),
      "two identical native vec-sum plans must compare sameResult " +
        "(the udaf twin embeds per-build encoders and never does)")
  }

  test("pgSizePretty mirrors the reference's unit ladder") {
    assert(Functions.pgSizePretty(0) == "0 bytes")
    assert(Functions.pgSizePretty(512) == "512 bytes")
    assert(Functions.pgSizePretty(2048) == "2.0 kB")
    assert(Functions.pgSizePretty(5L * 1024 * 1024) == "5.0 MB")
    assert(Functions.pgSizePretty(3L * 1024 * 1024 * 1024) == "3.0 GB")
    // total: never throws, always ends in a known unit
    val units = Seq("bytes", "kB", "MB", "GB", "TB", "PB")
    val prop = Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      units.exists(Functions.pgSizePretty(n).endsWith(_))
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("VecSum finishes an all-NULL group to NULL, never an empty array " +
    "(an empty 'centroid' scores distance 0 from everything through the " +
    "truncate-to-shorter loop — a silent cluster magnet)") {
    import spark.implicits._
    val df = Seq((1, null: Seq[Long]), (1, null: Seq[Long]),
      (2, Seq(1L, 2L)), (2, Seq(3L, 4L)))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(graft.functions.VecSum.vecSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(1).isEmpty, "all-null group must finish NULL")
    assert(out(2).contains(Seq(4L, 6L)))
  }

  test("pgSizePretty is locale-stable: a comma-decimal default locale " +
    "still prints the dot form pg_size_pretty uses") {
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try assert(Functions.pgSizePretty(1536) == "1.5 kB",
      "the f-interpolator formats with the DEFAULT locale; this must not")
    finally java.util.Locale.setDefault(prev)
  }
}
