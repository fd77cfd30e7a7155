package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given sf dir
  * and prints ONE parseable JSON line. Failures are NEVER swallowed into a
  * fast bench entry — they are reported per-query in `failed` and on
  * stderr. A short warmup pass absorbs JVM/JIT/codegen startup so the
  * first timed query isn't charged several seconds of session warmup.
  *
  * Output durability: log level is ERROR (not WARN) to keep executor
  * chatter off stderr, the JSON line is ALSO written to `bench.json`
  * (override with SPARK_GRAFT_BENCH_OUT), and the line is printed as the
  * very last thing after `spark.stop()` — so a driver that tails the
  * process output always sees the complete line, untruncated by shutdown
  * noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // corpus events.ts is ns-precision parquet; see graft.io.Tables.table
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warmup: scan+agg, broadcast join, window — the codegen paths the
    // timed queries exercise. Results discarded; failures ignored here
    // (the timed pass will surface them).
    Seq("a1_count", "j4_left_join", "w1_rownum_dedup").foreach { q =>
      SparkEntry.queries.get(q).foreach { fn =>
        try fn(spark, sfDir).count() catch { case _: Exception => () }
      }
    }

    val failures = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch {
        case e: Exception =>
          failures += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$failedJson}"""

    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }

    // stop FIRST so shutdown noise precedes (never truncates) the JSON line
    spark.stop()
    System.err.flush()
    println(line)
    System.out.flush()
  }
}
