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
  * both hash-partitioned on the join key — no driver-side adjacency
  * matrix. Round count is a parameter; lineage grows linearly with
  * rounds, so deep runs should checkpoint like [[Dedup.dedupClusters]]
  * (the handful of rounds used here keeps plans shallow).
  *
  * Like [[Dedup.dedupClusters]], a size-gated driver fast path handles
  * graphs whose aggregated edge list is tiny (the 25-nation trade graph;
  * a unit-test graph): below `graft.pagerank.driverMaxEdges` (default
  * 1e6) the same integer recurrence runs as one driver loop — iteration
  * overhead on local[*] is pure stage scheduling there, measured ~5s for
  * a 25-node graph. The distributed loop remains the path for real link
  * graphs (millions of domains), where it is the only option.
  *
  * All arithmetic is scaled-integer (BIGINT) with floor division at the
  * exact same points in every engine, so ranks are cross-engine
  * deterministic — no float summation-order drift. Dangling-node mass
  * (nodes with no out-edges) is dropped rather than redistributed; both
  * sides of the oracle agree on that definition. Node ids must be
  * integral (they are cast to BIGINT).
  */
object Graphs {

  /** `iters` rounds of scaled-integer PageRank over distinct directed
    * edges `(src, dst)`. Returns (node, rank) with ranks on a
    * `scale`-denominated fixed-point scale (initial mass = scale/n per
    * node; damping 0.85 as the exact integer expression
    * `(15*scale/100)/n + 85*incoming/100`).
    *
    * Execution contract: the distributed path checkpoints the converged
    * ranks EAGERLY (checkpoint truncates the iterated lineage and lets
    * the edge caches be released in-function), so the power iteration
    * runs at call time, not at the caller's first action, and the
    * returned plan is a checkpoint scan rather than the join/agg
    * pipeline. Checkpoint files follow the [[Dedup.dedupClusters]]
    * convention: one round of files under `graft.checkpointDir` (reliable
    * mode) backs the returned DataFrame and is the caller's to remove
    * after consuming it — there are no superseded intermediate rounds
    * here, the single final checkpoint is the only on-disk state. With no
    * `graft.checkpointDir`, `localCheckpoint` blocks are cleaned up by
    * the executor lifecycle. Note `setCheckpointDir` applies
    * session-wide.
    */
  def pageRankInt(edges: DataFrame, iters: Int = 5,
                  scale: Long = 1000000000L): DataFrame = {
    val spark = edges.sparkSession
    // persist the aggregated edge table: the size gate, the node count and
    // every iteration re-read it, and without the persist each action
    // replays the upstream edge-building join chain (a 4-table star join
    // in the trade-graph query). Registry-bounded like the LSH band
    // tables — there is no ReusedExchange across iterations otherwise.
    val e = CacheRegistry.register(
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val nEdges = e.count()
    require(nEdges > 0, "pageRankInt: empty graph")
    val driverMax = spark.conf.getOption("graft.pagerank.driverMaxEdges")
      .map(_.toLong).getOrElse(1000000L)
    if (nEdges <= driverMax) {
      val out = driverPageRank(e, iters, scale)
      // the recurrence collected everything it needs — drop the edge cache
      // now instead of leaving it for registry FIFO eviction
      CacheRegistry.release(e)
      return out
    }

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()

    // out-degree folded onto the edge relation ONCE (window over the
    // persisted edges), so each iteration is exactly two shuffles:
    // rank ⨝ ej on src, then the contribution agg on dst. Danglers (no
    // out-edges) simply have no ej row — their mass doesn't propagate.
    val ej = CacheRegistry.register(
      e.withColumn("outdeg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val n = nodes.count()
    val teleport = (15L * scale / 100L) / n
    var rank = nodes.withColumn("rank", lit(scale / n))

    (1 to iters).foreach { _ =>
      // `div` (SQL integral division) keeps every step in exact BIGINT —
      // float `/` would round-to-nearest before the floor and can disagree
      // with the oracle's `//` by 1 on quotients that land on a ulp edge
      val contrib = rank
        .join(ej, rank("node") === ej("src"))
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("incoming"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(incoming, 0L)) div 100")).as("rank"))
    }
    // one row per node — checkpoint the converged ranks eagerly (reliable
    // when graft.checkpointDir is set, executor-local otherwise, same
    // convention as Dedup.dedupClusters), which truncates the iterated
    // lineage and makes the e/ej caches dead — release them in-function so
    // repeated calls in one session don't accumulate MEMORY_AND_DISK
    // entries (registry eviction is a leak backstop, not a lifecycle)
    val reliableDir = spark.conf.getOption("graft.checkpointDir")
    reliableDir.foreach(spark.sparkContext.setCheckpointDir)
    val out =
      if (reliableDir.isDefined) rank.checkpoint() else rank.localCheckpoint()
    CacheRegistry.release(ej)
    CacheRegistry.release(e)
    out
  }

  /** The identical recurrence as one driver loop — bit-for-bit equal to
    * the distributed path (GraphsSpec proves it), viable because the gate
    * bounded the edge list. */
  private def driverPageRank(e: DataFrame, iters: Int, scale: Long): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val es = e.as[(Long, Long)].collect()
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val out = es.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = nodes.length.toLong
    val teleport = (15L * scale / 100L) / n
    var rank = nodes.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      val incoming = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(v =>
        v -> (teleport + 85L * incoming.getOrElse(v, 0L) / 100L)).toMap
    }
    nodes.map(v => (v, rank(v))).toSeq.toDF("node", "rank")
  }
}
