package graft

import org.apache.spark.sql.SparkSession

/** THE local SparkSession builder for every runnable main (Bench, Verify,
  * Smoke, Scratch, Explain). One definition so a session-level config (a
  * new legacy flag, a timezone) can never silently diverge between the
  * tools — before this, the same five-line block lived in five mains.
  */
object LocalSession {
  /** Cores default honors SPARK_GRAFT_CPUS; shuffle partitions track cores
    * (never the 200 default — pointless tiny tasks on local data). */
  def build(defaultCpus: String = "4", logLevel: String = "WARN"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // corpus events.ts is ns-precision parquet; see graft.io.Tables.table
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive (no-tz) parquet timestamps surface as TimestampType, not NTZ:
      // with session TZ pinned to UTC the instant equals the wall-clock, so
      // every timestamp flavor a source emits behaves identically downstream
      // (the reference is deliberately flavor-lenient — clickhouse_backend
      // .py:134-138 parseDateTimeBestEffortOrNull; duckdb_backend.py:107).
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // gzip interchange chunks compress at BEST_SPEED: the reference's
      // gzip role is transport framing, not archival (pgwarehouse.py:259
      // just wants warehouse loaders to accept the chunk), and deflate
      // level 1 emits the same standard gzip stream every reader accepts
      // at a fraction of the CPU — the difference is the bulk of the
      // extract path's runtime on wide tables
      .config("spark.hadoop.zlib.compress.level", "BEST_SPEED")
      // bucketed-table writes (Tables.writeBucketed) land in a throwaway
      // dir, never ./spark-warehouse inside the repo
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }

  /** The sf dir every tool should read unless told otherwise. */
  def sfDir(default: String = "/root/testdata/sf0.1"): String =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", default)
}
