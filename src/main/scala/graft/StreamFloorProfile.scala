package graft

/** Instrumented streaming-twin drain (r14, VERDICT r13 ask #7): where the
  * per-twin wall-clock floor actually goes at toy scale. Each of the 22
  * `stream_*` twins pays a shared fixed cost — session fork, schema/footer
  * read, checkpoint-dir creation, micro-batch planning, state-store init,
  * WAL + commit-log writes, the AvailableNow trailing no-data batch, and
  * the changelog read-back — that dominates sub-second data volumes and
  * amortizes to nothing at scale (the sf1→sf3 exponents already show it).
  * This main drains representative twins and splits the wall into:
  *
  *   - drain      = query-fn wall (session setup + start + all batches)
  *   - trigger    = Σ durationMs.triggerExecution (the engine's own work)
  *   - planning   = Σ queryPlanning (incremental plan per batch)
  *   - offsets    = Σ latestOffset + getBatch + walCommit + commitOffsets
  *                  (file-source listing + offset/commit log fsyncs)
  *   - addBatch   = Σ addBatch (the actual data work + foreachBatch sink)
  *   - outside    = drain − trigger (JVM/session/stream start/stop cost
  *                  that no conf can remove per-run)
  *   - readback   = changelog window-dedup + collect after the drain
  *
  * Usage: runMain graft.StreamFloorProfile [sfDir] [twin,twin,...]
  * Prints one JSON line per twin + a shared-floor summary; the committed
  * readout lives in artifacts/streaming_floor.md.
  */
object StreamFloorProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val twins = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "stream_window_agg", // update-mode changelog agg (the common shape)
      "stream_dedup", // stateful dropDuplicates
      "stream_sessionize", // complete-mode session windows
      "stream_decontaminate", // stream-static join
      "stream_cell_occupancy")) // smallest state (<=16 counters)
    val spark = LocalSession.build()
    // one warm-up drain so JVM/classloading/codegen cost doesn't masquerade
    // as per-twin floor (every twin after the first pays the warm price)
    SparkEntry.queries(twins.head)(spark, sf).collect()
    val rows = twins.map { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sf)
      val t1 = System.nanoTime()
      val n = df.collect().length
      val t2 = System.nanoTime()
      val prog = graft.streaming.StreamingSync.lastRunProgress
      def sumKey(k: String): Long = prog.map { p =>
        Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
      }.sum
      val trigger = sumKey("triggerExecution")
      val planning = sumKey("queryPlanning")
      val offsets = sumKey("latestOffset") + sumKey("getBatch") +
        sumKey("walCommit") + sumKey("commitOffsets")
      val addBatch = sumKey("addBatch")
      val drainMs = (t1 - t0) / 1000000
      val readbackMs = (t2 - t1) / 1000000
      val json = s"""{"twin":"$name","rows":$n,"batches":${prog.length},""" +
        s""""drain_ms":$drainMs,"trigger_ms":$trigger,""" +
        s""""planning_ms":$planning,"offsets_ms":$offsets,""" +
        s""""addbatch_ms":$addBatch,""" +
        s""""outside_ms":${drainMs - trigger},"readback_ms":$readbackMs}"""
      println(json)
      (name, drainMs, trigger, planning, offsets, addBatch, readbackMs)
    }
    val floors = rows.map(r => r._2 - r._6) // drain minus addBatch = floor
    println(s"""{"summary":"shared floor (drain-addBatch) per twin","min_ms":${floors.min},"median_ms":${floors.sorted.apply(floors.length / 2)},"max_ms":${floors.max}}""")
    spark.stop()
  }
}
