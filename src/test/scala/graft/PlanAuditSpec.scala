package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: no registered query may plan a Cartesian
  * product or nested-loop join — the two shapes that die at 100 TB. The
  * single exception is the documented brute-force ANN baseline
  * (`x_ann_topk`), whose broadcast cross join against a tiny query set is
  * the point of the operator (the scale paths are `x_ann_ivf`/`x_ann_lsh`).
  *
  * Queries that execute side effects at construction time (streaming runs,
  * CSV writes) are exercised by their own suites and skipped here.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val sideEffecting =
    Set("stream_window_agg", "stream_user_rollup", "stream_dedup",
      "s2_csv_roundtrip")
  // x_ann_topk: documented brute-force baseline; x_ann_kmeans_assign /
  // x_ann_kmeans / x_ann_ivf_multiprobe: k tiny centroid rows broadcast
  // against every vector (assign/probe-selection step) — deliberate
  // broadcast products over a handful of centroids, never corpus×corpus
  private val allowCross = Set("x_ann_topk", "x_ann_kmeans_assign",
    "x_ann_kmeans", "x_ann_ivf_multiprobe")

  test("no query plans a cartesian product or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if sideEffecting(name) || allowCross(name) => None
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) Some(name)
        else None
    }
    assert(offenders.isEmpty,
      s"queries with non-scalable join shapes: ${offenders.mkString(", ")}")
  }

  test("x_pack_greedy windows over a high-cardinality shard key") {
    // the running-sum window must not partition by lang alone (~4 values);
    // the composed (lang, md5-shard) key keeps parallelism ∝ data volume
    val df = SparkEntry.queries("x_pack_greedy")(spark, sf)
    val nShardKeys = df.select("lang", "shard").distinct().count()
    assert(nShardKeys > 16,
      s"window shard key has only $nShardKeys distinct values — " +
        "parallelism would not scale past language count")
  }

  test("parquet scans prune columns: s1 reads only the projected four") {
    val plan = SparkEntry.queries("s1_scan_project")(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length == 4,
      s"expected 4 pruned columns, got: $readSchema")
  }
}
