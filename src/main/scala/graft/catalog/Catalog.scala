package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** Catalog operations (reference S8-S13, SURVEY §2.1): table listing with
  * sizes, existence probes, row counts, drops — over `spark.catalog` plus
  * file-system metadata for path-addressed parquet tables.
  *
  * The reference's `list` joins pg_class/pg_namespace and computes
  * pg_total_relation_size + pretty sizes (pgwarehouse.py:218-237); here the
  * equivalent for a parquet corpus is file metadata (cheap, no scan) plus an
  * optional exact `count()`.
  */
object Catalog {

  val corpusTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** S9: list source tables with byte sizes, sorted desc — mirrors the
    * reference's `order by table_bytes desc` (pgwarehouse.py:231). File sizes
    * come from the filesystem, not a scan.
    */
  def listWithSizes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    corpusTables.map { t =>
      val f = new java.io.File(s"$sfDir/$t.parquet")
      val bytes = if (f.isFile) f.length
      else if (f.isDirectory) f.listFiles.filter(_.isFile).map(_.length).sum
      else 0L
      (t, bytes, Functions.pgSizePretty(bytes))
    }.toDF("table_name", "total_bytes", "pretty_size")
      .orderBy(desc("total_bytes"), asc("table_name"))
  }

  /** S9/A1: exact row counts per table (the reference's parity check,
    * `count_table`). Distributed count per table; counts are metadata-only on
    * parquet (row-group stats) so this stays cheap even at 100 TB.
    */
  def rowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    corpusTables.map { t =>
      t -> spark.read.parquet(s"$sfDir/$t.parquet").count()
    }.toDF("table_name", "n_rows").orderBy("table_name")
  }

  /** S10/S11: bare name list. */
  def tableNames(sfDir: String): Seq[String] = corpusTables.sorted

  /** S12: existence probe. */
  def tableExists(sfDir: String, name: String): Boolean =
    new java.io.File(s"$sfDir/$name.parquet").exists

  /** S13: schema introspection — on parquet, the footer schema (no scan). */
  def describe(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/$name.parquet").schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("column_name", "data_type", "nullable")
  }

  /** S8: drop a managed table / delete a path-addressed one. */
  def dropTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
}
