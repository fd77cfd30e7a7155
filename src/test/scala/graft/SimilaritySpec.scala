package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** ANN top-k on hand-computable vectors: exact integer quantization, rank
  * order, tie-breaks, and the IVF cell restriction.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // dot(q, n2) > dot(q, n3) > dot(q, n4); n5 sits in another cell
  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),
    (3L, Array(0.5f, 0.5f, 0.0f), 0),
    (4L, Array(0.1f, 0.9f, 0.0f), 0),
    (5L, Array(1.0f, 0.0f, 0.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by exact integer dot product") {
    val out = Similarity.bruteForceTopK(
      vecs.where(col("vec_id") === 1), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 2L, 3L),
      "n5 ties n1's own vector omitted; exact dup ranks first")
    assert(out.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L))
    // cosine of the identical vector is exactly 1.0
    assert(out.head.getDouble(3) == 1.0)
  }

  test("cluster balance partitions the corpus: counts sum to N, shares to 1") {
    val sf = TestSpark.tmpDir("clusterbal")
    val rnd = new scala.util.Random(5)
    (1L to 40L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$sf/embeddings.parquet")
    val out = SparkEntry.queries("x_cluster_balance")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == 40L,
      "every embedding lands in exactly one cell")
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-9,
      "shares sum to 1")
    assert(out.forall(_.getLong(1) > 0), "only occupied cells are reported")
  }

  test("ivf top-k only probes the query's cell") {
    val out = Similarity.ivfTopK(
      vecs.where(col("vec_id") === 1), vecs, "vec_id", "embedding", "label", k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(2L, 3L, 4L), "cell-1 vector (id 5) is never probed")
  }

  test("multi-probe ivf recovers the cross-cell neighbor single-probe loses") {
    // query 1 lives in cell 0; its exact duplicate (id 5) lives in cell 1.
    // nprobe=1 degenerates to the query's nearest cell only; nprobe=2 must
    // reach into cell 1 and surface the duplicate at rank 1.
    val two = Similarity.ivfMultiProbeTopK(
      vecs.where(col("vec_id") === 1), vecs, "vec_id", "embedding", "label",
      k = 10, nprobe = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(two.contains(5L), "second probe reaches the neighboring cell")
    assert(two.head == 5L, "the exact duplicate ranks first once reachable")
    val one = Similarity.ivfMultiProbeTopK(
      vecs.where(col("vec_id") === 1), vecs, "vec_id", "embedding", "label",
      k = 10, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(!one.contains(5L) || one.size < two.size,
      "nprobe=1 probes strictly fewer cells")
  }

  test("kmeans iterations converge identical vectors into one cell") {
    val out = Similarity.kmeansIterations(vecs, "vec_id", "embedding",
      iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), "every vector assigned")
    assert(out(1L) == out(5L),
      "identical vectors land in the same trained cell regardless of seed")
  }

  test("IVF / LSH / multi-probe recall@3 vs brute-force ground truth " +
    "holds the pinned floors at sf0.01") {
    // The approximate family is correct vs its own definition by oracle;
    // this pins the accuracy/cost trade against exhaustive search the way
    // FuzzyJoinSpec pins blocking recall (VERDICT r5 next-7). Ground truth
    // is the brute-force top-3 per query; recall@3 = |approx ∩ truth| / 3
    // averaged over the 10 query vectors.
    val sf = "/root/testdata/sf0.01"
    val truth = SparkEntry.queries("x_ann_topk")(spark, sf)
      .where(col("rank") <= 3).select("qid", "nid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallAt3(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, sf)
        .select("qid", "nid").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).count(t).toDouble / t.size }
      per.sum / per.size
    }
    val ivf = recallAt3("x_ann_ivf")
    val trained = recallAt3("x_ann_ivf_trained")
    val mp = recallAt3("x_ann_ivf_multiprobe")
    val lsh = recallAt3("x_ann_lsh")
    info(f"recall@3 — ivf=$ivf%.2f trained=$trained%.2f " +
      f"multiprobe=$mp%.2f lsh=$lsh%.2f")
    // r7: x_ann_ivf is now the DEFAULT path — data-derived 16-cell
    // sign-LSH quantizer + 4-probe — measured 0.67 at sf0.01. Context for
    // the floors: this corpus's embeddings are ISOTROPIC (mean pairwise
    // cosine ≈ 0.000, intra-label cosine 0.0016 ≈ inter-label 0.0003, and
    // only 3% of true top-3 neighbors share the query's label), so
    // recall@3 is structurally proportional to the corpus fraction probed
    // for ANY quantizer — 0.67 while probing 4/16 cells is the measured
    // recall-per-candidate optimum across the label/LSH/k-means × probes
    // grid. The two low-recall variants stay deliberately: multiprobe
    // (class-label cells, 2 probes, 0.30) shows distance-based probing
    // rescuing a geometry-free partition, and lsh (single probe, 0.17)
    // shows why one probe is never enough. Floors pin measured levels so
    // a regression in the probe/bucket math is visible.
    assert(ivf >= 0.60, f"default ANN path recall@3 must stay >= 0.6: $ivf%.2f")
    assert(trained >= 0.55,
      f"trained-quantizer multi-probe recall@3 regressed: $trained%.2f")
    assert(mp >= 0.25, f"multi-probe recall@3 regressed: $mp%.2f")
    assert(lsh >= 0.10, f"data-derived LSH-cell recall@3 regressed: $lsh%.2f")
  }

  test("trained quantizer pays off on clustered geometry: recall@3 >= 0.9 " +
    "probing 2/16 cells") {
    // The sf-corpus floors above are bounded by ISOTROPIC geometry (recall
    // ∝ probe fraction for any quantizer there). This plants structure —
    // 8 well-separated axis clusters of 30 vectors each, noise ±0.05 —
    // and asserts the same train-then-multi-probe machinery that yields
    // 0.55 on noise reaches near-perfect recall probing only 2 of 16
    // cells when geometry allows: the index pays for itself exactly when
    // structure exists, which is the claim a user buys an IVF index for.
    val rnd = new scala.util.Random(42)
    val kClusters = 8; val perCluster = 30; val dim = 16
    val rows = for (c <- 0 until kClusters; j <- 0 until perCluster) yield {
      val id = (c * perCluster + j).toLong
      val v = Array.tabulate(dim)(i =>
        (if (i == c) 10.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
      (id, v, c.toLong)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val isQuery = col("vec_id") % perCluster === 0 // one query per cluster

    val cells = Similarity.kmeansIterations(df, "vec_id", "embedding",
      iters = 2).select(col("id").as("vec_id"), col("cell"))
    val indexed = df.join(cells, "vec_id")
    assert(indexed.select("cell").distinct().count() <= 16,
      "4-bit seeded quantizer must train at most 16 cells")

    val truth = Similarity.bruteForceTopK(
      df.where(isQuery), df, "vec_id", "embedding", k = 3)
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = Similarity.ivfMultiProbeTopK(
      indexed.where(isQuery), indexed, "vec_id", "embedding", "cell",
      k = 3, nprobe = 2)
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty[Long]).count(t).toDouble / t.size }
    val recall = per.sum / per.size
    info(f"planted-cluster recall@3 = $recall%.2f over ${truth.size} queries")
    assert(recall >= 0.9,
      f"trained quantizer must reach recall@3 >= 0.9 on clustered " +
        f"geometry probing 2/16 cells, got $recall%.2f")
  }

  test("graft.ann.recallQueries scales the recall monitor's truth side") {
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("graft.ann.recallQueries", "3")
    try {
      val qids = SparkEntry.queries("x_ann_recall")(spark, sf)
        .select("qid").distinct().collect().map(_.getLong(0)).toSet
      assert(qids == Set(0L, 1L, 2L),
        s"truth side must sample exactly vec_id < 3, got $qids")
    } finally spark.conf.unset("graft.ann.recallQueries")
    spark.conf.set("graft.ann.recallQueries", "not-a-number")
    try {
      val ex = intercept[IllegalArgumentException] {
        SparkEntry.queries("x_ann_recall")(spark, sf).count()
      }
      assert(ex.getMessage.contains("graft.ann.recallQueries"),
        s"error must name the conf key, got: ${ex.getMessage}")
    } finally spark.conf.unset("graft.ann.recallQueries")
  }

  test("quantization is exact at 1e-6 resolution") {
    val q = Seq((1L, Array(0.123456f, -1.5f)))
      .toDF("id", "v")
      .select(Similarity.quantize(col("v")).as("vq"))
      .collect().head.getSeq[Long](0)
    assert(q == Seq(123456L, -1500000L))
  }

  test("native sign-LSH bucket == composed-builtins form (generative law " +
    "over non-empty vectors, incl. shorter-than-totalPlanes / negative sums)") {
    val rnd = new scala.util.Random(41)
    // dims span < totalPlanes, == and > totalPlanes (empty pinned below:
    // the composed form's sequence(0,-1) artifact diverges there and the
    // native form follows the ORACLE instead — see SignLshBucketLong doc)
    val rows = (0 until 300).map { i =>
      val dim = Seq(1, 3, 16, 17, 64, 200)(i % 6)
      (i.toLong, Array.fill(dim)(rnd.between(-2000000L, 2000000L)))
    }
    val df = rows.toDF("id", "vq")
    // plane subsets: contiguous low bits, a sparse subset, all 16, mod-2
    val cases = Seq((0 until 4, 16), (Seq(1, 5, 11, 15), 16), (0 until 16, 16),
      (0 until 2, 2))
    cases.foreach { case (planes, total) =>
      val out = df.select(
        Similarity.signLshBucket(col("vq"), planes, total).as("native"),
        Similarity.composedSignLshBucket(col("vq"), planes, total).as("composed"))
        .where(col("native") =!= col("composed")).count()
      assert(out == 0L, s"native != composed for planes=$planes total=$total")
    }
    // empty vector → bucket 0, the DuckDB oracle's semantics (list_sum of
    // an empty list is NULL → every sign CASE falls to its ELSE 0); the
    // composed form's sequence artifact gave a third answer here, never
    // exercised because no corpus vector is empty
    val empty = Seq((1L, Array.empty[Long])).toDF("id", "vq")
      .select(Similarity.signLshBucket(col("vq"), 0 until 4, 16).as("b"))
      .collect()
    assert(empty.head.getLong(0) == 0L)
    // null vector → bucket 0, matching BOTH the composed form (each bit's
    // when(null >= 0, …).otherwise(0) falls to 0) and the oracle's CASE …
    // ELSE 0 — default UnaryExpression null propagation would instead drop
    // null-vector rows from every bucket equi-join (r14 review find)
    val nulls = Seq((1L, null: Array[Long])).toDF("id", "vq")
      .select(Similarity.signLshBucket(col("vq"), 0 until 4, 16).as("b"),
        Similarity.composedSignLshBucket(col("vq"), 0 until 4, 16).as("c"))
      .collect()
    assert(!nulls.head.isNullAt(0) && nulls.head.getLong(0) == 0L)
    assert(nulls.head.getLong(1) == 0L,
      "composed-form null semantics drifted: the native form mirrors it")
  }
}
