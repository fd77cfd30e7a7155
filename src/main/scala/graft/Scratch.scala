package graft


/** Throwaway local runner for iterating on a single query / plan audits. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build(defaultCpus = "32")
    val d = LocalSession.sfDir()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    spark.read.parquet(s"$d/events.parquet").count()
    // warm the streaming machinery once
    graft.streaming.StreamingSync.windowedEventCounts(spark, d, 5).count()
    for (n <- Seq("8", "4", "2")) {
      spark.conf.set("graft.stream.statePartitions", n)
      time(s"window_sp$n")(
        graft.streaming.StreamingSync.windowedEventCounts(spark, d, 5).count())
      time(s"rollup_sp$n")(
        graft.streaming.StreamingSync.statefulUserRollup(spark, d).count())
    }
    spark.stop()
  }
}
