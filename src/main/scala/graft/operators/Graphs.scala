package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge relations.
  *
  * The pretraining-pipeline use case: rank the link graph (domain →
  * domain, or duplicate-cluster adjacency) so crawl quality scores can
  * weight sampling — the classic PageRank signal. The implementation is
  * pure DataFrame power iteration: each round is one equi-join
  * (rank ⨝ edges on src) plus one aggregation (sum contributions by dst),
  * both hash-partitioned on the join key — no driver-side graph, no
  * adjacency matrix. Round count is a parameter; lineage grows linearly
  * with rounds, so deep runs should checkpoint like
  * [[Dedup.dedupClusters]] (the handful of rounds used here keeps plans
  * shallow).
  *
  * All arithmetic is scaled-integer (BIGINT) with floor division at the
  * exact same points in every engine, so ranks are cross-engine
  * deterministic — no float summation-order drift. Dangling-node mass
  * (nodes with no out-edges) is dropped rather than redistributed; both
  * sides of the oracle agree on that definition.
  */
object Graphs {

  /** `iters` rounds of scaled-integer PageRank over distinct directed
    * edges `(src, dst)`. Returns (node, rank) with ranks on a
    * `scale`-denominated fixed-point scale (initial mass = scale/n per
    * node; damping 0.85 as the exact integer expression
    * `(15*scale/100)/n + 85*incoming/100`).
    */
  def pageRankInt(edges: DataFrame, iters: Int = 5,
                  scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()

    // out-degree per source; nodes joined left so danglers carry rank
    // (their mass just doesn't propagate — see scaladoc)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))

    val n = nodes.count() // one tiny scalar per call; the graph is the aggregated domain graph, not the corpus
    require(n > 0, "pageRankInt: empty graph")

    val teleport = (15L * scale / 100L) / n
    var rank = nodes.withColumn("rank", lit(scale / n))

    (1 to iters).foreach { _ =>
      // `div` (SQL integral division) keeps every step in exact BIGINT —
      // float `/` would round-to-nearest before the floor and can disagree
      // with the oracle's `//` by 1 on quotients that land on a ulp edge
      val contrib = rank
        .join(e, rank("node") === e("src"))
        .join(outDeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("incoming"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(incoming, 0L)) div 100")).as("rank"))
    }
    rank
  }
}
