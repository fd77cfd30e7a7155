package graft

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Catalog

/** Catalog ops over a scratch directory through the Hadoop FS API:
  * listing, sizes, existence, describe, drop.
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.tmpDir("catalog")

  private def seed(): Unit = {
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/t1.parquet")
    Seq((1L, 1.5)).toDF("id", "x")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/t2.parquet")
  }

  test("listTables finds exactly the parquet tables, sorted") {
    seed()
    assert(Catalog.listTables(spark, dir) == Seq("t1", "t2"))
    assert(Catalog.listTables(spark, s"$dir/absent") == Seq.empty)
  }

  test("tableExists and tableBytes through Hadoop FS") {
    seed()
    assert(Catalog.tableExists(spark, dir, "t1"))
    assert(!Catalog.tableExists(spark, dir, "zzz"))
    assert(Catalog.tableBytes(spark, s"$dir/t1.parquet") > 0)
    assert(Catalog.tableBytes(spark, s"$dir/zzz.parquet") == 0)
  }

  test("listWithSizes sorts by bytes desc and pretty-prints") {
    seed()
    val rows = Catalog.listWithSizes(spark, dir, Seq("t1", "t2")).collect()
    assert(rows.map(_.getString(0)).toSet == Set("t1", "t2"))
    assert(rows.head.getLong(1) >= rows.last.getLong(1), "desc by bytes")
    assert(rows.forall(_.getString(2).nonEmpty))
  }

  test("describe exposes the footer schema without a scan") {
    seed()
    val d = Catalog.describe(spark, dir, "t1").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d == Map("id" -> "bigint", "v" -> "string"))
  }

  test("dropPath removes a table; drop is idempotent") {
    seed()
    assert(Catalog.dropPath(spark, s"$dir/t2.parquet"))
    assert(!Catalog.tableExists(spark, dir, "t2"))
    assert(!Catalog.dropPath(spark, s"$dir/t2.parquet"), "second drop no-op")
  }
}
