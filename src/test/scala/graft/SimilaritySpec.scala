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

  test("ivf top-k only probes the query's cell") {
    val out = Similarity.ivfTopK(
      vecs.where(col("vec_id") === 1), vecs, "vec_id", "embedding", "label", k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(2L, 3L, 4L), "cell-1 vector (id 5) is never probed")
  }

  test("quantization is exact at 1e-6 resolution") {
    val q = Seq((1L, Array(0.123456f, -1.5f)))
      .toDF("id", "v")
      .select(Similarity.quantize(col("v")).as("vq"))
      .collect().head.getSeq[Long](0)
    assert(q == Seq(123456L, -1500000L))
  }
}
