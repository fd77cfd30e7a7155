package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embeddings, Similarity}

/** Embedding toolbox invariants: int8 quantization error bound, random-
  * projection determinism/linearity, and the integer-entropy extremes the
  * `x_entropy_bits` / `x_pmi_bigrams` queries rely on.
  */
class EmbedToolboxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vq(xs: Seq[Double]) =
    Similarity.quantize(typedLit(xs.map(_.toFloat)))

  test("int8: per-element error is bounded by scale/2 (2·max_err127 ≤ m) " +
    "and the zero vector quantizes cleanly") {
    val vecs = Seq(
      Seq(0.3, -0.7, 0.001, 0.9999, -0.0004, 0.5),
      Seq(1e-6, 2e-6, -3e-6, 0.0, 0.0, 0.0), // tiny scale
      Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0), // all-zero → scale 0
      Seq(-1.0, 1.0, -1.0, 1.0, -1.0, 1.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("id", "emb")
      .select(col("id"), Embeddings.int8Stats(
        Similarity.quantize(col("emb"))).as("st"))
      .select(col("id"), col("st.scale_q").as("m"),
        col("st.sum_err127").as("se"), col("st.max_err127").as("me"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    for ((id, m, se, me) <- rows) {
      assert(2 * me <= m, s"vec $id: max_err127 $me exceeds m/2 (m=$m)")
      assert(se >= 0 && me >= 0)
    }
    val zero = rows(2)
    assert(zero._2 == 0 && zero._3 == 0 && zero._4 == 0,
      "all-zero vector → scale 0, zero error")
  }

  test("int8 codes: range [-127, 127], sign-symmetric, scale maps to ±127") {
    val df = Seq((1L, Seq(0.5f, -0.5f, 0.25f, -0.125f, 0.0f)))
      .toDF("id", "emb")
      .select(Embeddings.int8Codes(Similarity.quantize(col("emb"))).as("c"))
    val codes = df.collect()(0).getSeq[Long](0)
    assert(codes == Seq(127L, -127L, 64L, -32L, 0L),
      s"codes for a power-of-two ladder are exact: got $codes")
  }

  test("random projection: deterministic, linear, and rows of the sign " +
    "matrix are distinct and balanced") {
    val signs = Embeddings.rpSigns(64, 8)
    assert(signs.map(_.mkString).distinct.size == 8,
      "no two output dims share a sign row (degenerate projection)")
    for ((row, j) <- signs.zipWithIndex) {
      val plus = row.count(_ == 1L)
      assert(plus >= 20 && plus <= 44, s"dim $j badly unbalanced: +$plus/64")
    }
    val a = Seq.tabulate(64)(i => (i % 7 - 3) / 10.0)
    val b = Seq.tabulate(64)(i => (i % 5 - 2) / 10.0)
    val df = Seq((1L, a, b)).toDF("id", "a", "b").select(
      Embeddings.randomProject(Similarity.quantize(col("a").cast("array<float>")), 64, 8).as("pa"),
      Embeddings.randomProject(Similarity.quantize(col("b").cast("array<float>")), 64, 8).as("pb"),
      Embeddings.randomProject(
        zip_with(Similarity.quantize(col("a").cast("array<float>")),
          Similarity.quantize(col("b").cast("array<float>")), _ + _), 64, 8).as("pab"))
    val r = df.collect()(0)
    val (pa, pb, pab) = (r.getSeq[Long](0), r.getSeq[Long](1), r.getSeq[Long](2))
    assert(pa.zip(pb).map { case (x, y) => x + y } == pab,
      "projection is linear: P(a+b) = P(a)+P(b)")
  }

  test("int8 property: error bound and sign round-trip hold on generated " +
    "vectors (incl. denormal-ish, negative, and spiky scales)") {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(16, Gen.chooseNum(-4.0, 4.0))
    val seed = org.scalacheck.rng.Seed(20260814L)
    // one deterministic batch of 40 vectors through the REAL Spark path
    val vecs = Iterator.iterate(seed)(_.next)
      .map(s => gen.apply(Gen.Parameters.default, s))
      .collect { case Some(v) => v }.take(40).toSeq
    val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("id", "emb")
      .select(col("id"),
        Embeddings.int8Stats(Similarity.quantize(col("emb"))).as("st"),
        Embeddings.int8Codes(Similarity.quantize(col("emb"))).as("codes"))
      .select(col("id"), col("st.scale_q"), col("st.max_err127"), col("codes"))
      .collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val (m, me, codes) = (r.getLong(1), r.getLong(2), r.getSeq[Long](3))
      assert(2 * me <= m || m == 0, s"row ${r.getLong(0)}: bound broken")
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(codes.exists(c => c == 127L || c == -127L) || m == 0,
        "the max-magnitude element always maps to ±127")
    }
  }

  test("entropy bits: constant doc → 0; all-distinct doc → N·bitlen(N) − N") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam", "en", "s", 40L),
      (2L, "one two three four five six seven eight", "en", "s", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.tmpDir("ent")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x_entropy_bits")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((8L, 1L, 0L)), "8× one token: zero entropy")
    // N=8, bitlen(8)=4 → 8·4 − 8·bitlen(1)=1 each → 32−8 = 24
    assert(out(2L) == ((8L, 8L, 24L)), "8 distinct tokens: N·bitlen(N)−N")
  }

  test("vocab coverage: exact basis points on a known Zipf-ish corpus") {
    val docs = Seq(
      // "a"×6, "b"×3, "c"×1 → N=10; top-1 covers 6000bp, top-3 10000bp
      (1L, "a a a b b c", "en", "s", 11L),
      (2L, "a a a b", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.tmpDir("vocab")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x_vocab_coverage")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == ((6L, 6000L)), "top-1 type covers 6/10 tokens")
    assert(rows(3L) == ((10L, 10000L)), "full 3-type vocab covers all")
    assert(!rows.contains(10L), "no checkpoint past the vocab size")
  }

  test("crosslingual mine: picks the max-dot en neighbor within the cell " +
    "and en docs are never queries") {
    // all vectors on the same ray → one LSH cell for everyone; dot with
    // the query then ranks purely by neighbor magnitude
    def vec(scale: Float) = Seq.tabulate(64)(i => (i % 3 + 1) * scale * 0.01f)
    val dir = TestSpark.tmpDir("xling")
    Seq((0L, vec(1f), 0), (1L, vec(2f), 0), (2L, vec(3f), 0), (3L, vec(4f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq((0L, "bonjour", "fr", "s", 7L), (1L, "hello", "en", "s", 5L),
      (2L, "hola", "es", "s", 4L), (3L, "hi there", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x_crosslingual_mine")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(0L, 2L), "only non-en docs are queries")
    assert(rows(0L)._2 == 3L && rows(2L)._2 == 3L,
      "both queries pick the largest-magnitude en vector (max dot)")
    assert(rows(0L)._1 == "fr" && rows(2L)._1 == "es")
  }

  test("pmi bigrams: an always-co-occurring pair outranks independent pairs") {
    val glued = (1 to 30).map(i => (i.toLong, "alpha beta noise" + (i % 7) +
      " filler" + (i % 11) + " alpha beta", "en", "s", 30L))
    val docs = glued.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.tmpDir("pmi")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x_pmi_bigrams")(spark, dir).collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert(top.getString(0) == "alpha beta",
      s"glued collocation wins: got ${top.getString(0)}")
    // support floor: nothing below 5 occurrences appears
    assert(rows.forall(_.getLong(1) >= 5L))
  }
}
