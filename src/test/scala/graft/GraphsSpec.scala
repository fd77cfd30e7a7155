package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graphs

class GraphsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toDF("src", "dst")

  /** Reference single-threaded implementation of the exact same integer
    * recurrence — the spec is "distributed result ≡ scalar result". */
  private def refRank(es: Seq[(Long, Long)], iters: Int,
                      scale: Long = 1000000000L): Map[Long, Long] = {
    val e = es.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val teleport = (15L * scale / 100L) / n
    var rank = nodes.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      val incoming = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(v => v -> (teleport + 85L * incoming.getOrElse(v, 0L) / 100L)).toMap
    }
    rank
  }

  test("distributed ranks equal the scalar reference recurrence") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val got = Graphs.pageRankInt(edges(es: _*), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == refRank(es, 5))
  }

  test("hub of a star graph outranks the leaves") {
    val es = (2L to 6L).map(i => (i, 1L)) ++ Seq((1L, 2L))
    val got = Graphs.pageRankInt(edges(es: _*), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) > got(2L))
    assert((3L to 6L).forall(i => got(2L) > got(i)))
  }

  test("distributed path (gate off) is bit-for-bit equal to the driver fast path") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (5L, 4L))
    val viaDriver = Graphs.pageRankInt(edges(es: _*), iters = 4)
      .as[(Long, Long)].collect().toMap
    spark.conf.set("graft.pagerank.driverMaxEdges", "0")
    try {
      val distributed = Graphs.pageRankInt(edges(es: _*), iters = 4)
        .as[(Long, Long)].collect().toMap
      assert(distributed == viaDriver)
      assert(distributed == refRank(es, 4))
    } finally spark.conf.unset("graft.pagerank.driverMaxEdges")
  }

  test("pageRankInt releases its registered caches on both paths") {
    // VERDICT r5 §wrong-3: repeated invocations in one session must not
    // accumulate MEMORY_AND_DISK entries — both the driver fast path and
    // the distributed path release e/ej in-function (the distributed path
    // checkpoints the converged ranks first, so the result stays readable).
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    val before = graft.operators.CacheRegistry.entryCount
    Graphs.pageRankInt(edges(es: _*), iters = 2).collect()
    assert(graft.operators.CacheRegistry.entryCount == before,
      "driver fast path left registered cache entries behind")
    spark.conf.set("graft.pagerank.driverMaxEdges", "0")
    try {
      val got = Graphs.pageRankInt(edges(es: _*), iters = 2)
        .as[(Long, Long)].collect().toMap
      assert(got == refRank(es, 2)) // result survives the in-function release
      assert(graft.operators.CacheRegistry.entryCount == before,
        "distributed path left registered cache entries behind")
    } finally spark.conf.unset("graft.pagerank.driverMaxEdges")
  }

  test("kmeansIterations retains at most the final round's cache entry") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val before = graft.operators.CacheRegistry.entryCount
    graft.operators.Similarity
      .kmeansIterations(vecs, "vec_id", "embedding", iters = 3).collect()
    assert(graft.operators.CacheRegistry.entryCount <= before + 1,
      "superseded k-means rounds were not released")
  }

  test("duplicate edges collapse; dangling nodes keep the teleport floor") {
    val es = Seq((1L, 2L), (1L, 2L), (1L, 2L)) // 2 is dangling
    val got = Graphs.pageRankInt(edges(es: _*), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == refRank(Seq((1L, 2L)), 2))
    // node 1 gets no incoming mass → pure teleport term
    assert(got(1L) == (15L * 1000000000L / 100L) / 2L)
  }
}
