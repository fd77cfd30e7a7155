package graft

/** Throwaway dev probe for the ivf_trained ↔ dedup_semantic cache-thrash:
  * runs the two queries alternately and prints per-run executor CPU plus
  * which cached plans exist before/after, via the session catalog's
  * isCached and a cacheManager dump through ColumnBridge.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build(defaultCpus = "32", logLevel = "ERROR")
    val d = LocalSession.sfDir()
    val cpu = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            cpu.addAndGet(m.executorCpuTime + m.executorDeserializeCpuTime)
        }
      })
    def drain(): Unit =
      org.apache.spark.sql.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
    def cachedPlans(): Seq[String] =
      org.apache.spark.sql.graft.ColumnBridge.cachedPlanSummaries(spark)

    def run(name: String): Unit = {
      drain(); val c0 = cpu.get(); val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      drain()
      println(f"[probe] $name wall=${(System.nanoTime() - t0) / 1e9}%.2f " +
        f"cpu=${(cpu.get() - c0) / 1e9}%.2f  cachedEntries=${cachedPlans().size}")
      cachedPlans().foreach(p => println(s"  [cache] $p"))
    }

    // sameResult probe: does re-building the same kmeans chain produce
    // plan-equal frames (register dedupe + CacheManager dedupe depend on it)?
    val e = graft.io.Tables.table(spark, d, "embeddings")
    import org.apache.spark.sql.functions.col
    def seed() = e.select(col("vec_id").as("id"),
      graft.operators.Similarity.quantize(col("embedding")).as("vq"))
    val s1 = seed(); val s2 = seed()
    println(s"[probe] seed sameResult: " +
      s1.queryExecution.analyzed.sameResult(s2.queryExecution.analyzed))
    def cent(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("id"))
      .agg(graft.functions.VecSum.vecSum(col("vq")).as("sums"))
    val c1 = cent(s1); val c2 = cent(s2)
    println(s"[probe] vecsum sameResult: " +
      c1.queryExecution.analyzed.sameResult(c2.queryExecution.analyzed))

    run("x_dedup_semantic")
    run("x_dedup_semantic")
    run("x_ann_ivf_trained")
    run("x_dedup_semantic")
    run("x_ann_ivf_trained")
    run("x_dedup_semantic")
    spark.stop()
  }
}
