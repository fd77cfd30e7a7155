package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM (Test/fork=true):
  * Spark session startup is ~5s, so suites must not each build their own.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      // mirror LocalSession (r15): serialized shuffle writer — the bypass
      // writer's per-reduce-partition file creates dominated executor CPU
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      // mirror LocalSession (r15): let AQE coalesce below defaultParallelism
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // mirror LocalSession: naive parquet timestamps read as TimestampType
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // mirror LocalSession: interchange gzip at BEST_SPEED
      .config("spark.hadoop.zlib.compress.level", "BEST_SPEED")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Fresh temp dir under the JVM's tmpdir, deleted on JVM exit. */
  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_test_$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }
}
