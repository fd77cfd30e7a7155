package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables

/** The JDBC source/sink surface (S1 real-source path, S4-S6 bulk insert)
  * against an embedded Derby database — the warehouse-connectivity path the
  * parquet corpus can't exercise. Covers append, read-back, the pushed-down
  * filter, and the partitioned parallel scan.
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:grafttest;create=true"

  private def seeded(table: String): Unit = {
    val df = (1 to 40).map(i => (i.toLong, s"name$i", i * 1.5))
      .toDF("id", "name", "amount")
    Tables.jdbcAppend(df, url, table)
  }

  test("jdbcAppend + jdbcTable round-trip (S4-S6 bulk insert shape)") {
    seeded("t_roundtrip")
    val back = Tables.jdbcTable(spark, url, "t_roundtrip")
    assert(back.count() == 40)
    assert(back.columns.map(_.toLowerCase).toSet == Set("id", "name", "amount"))
  }

  test("filter lands inside the source query, like the reference's \\copy filter") {
    seeded("t_filtered")
    // raw SQL filter, quoted for Derby's case-sensitive quoted identifiers
    val filtered = Tables.jdbcTable(spark, url, "t_filtered",
      filter = Some("\"id\" > 30"))
    assert(filtered.count() == 10)
  }

  test("partitionColumn parallelizes the scan without changing results") {
    seeded("t_part")
    val part = Tables.jdbcTable(spark, url, "t_part",
      partitionColumn = Some(("id", 1L, 40L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 40)
  }

  test("plan audit: P3/P4 watermark predicates compile into the JDBC scan " +
    "(PushedFilters on the remote relation — the reference's whole perf " +
    "story, clickhouse_backend.py:217,227 / pgwarehouse.py:275)") {
    seeded("t_pushdown")
    val p3 = graft.sync.Watermark.newerThan(
      Tables.jdbcTable(spark, url, "t_pushdown"), "id", Some(30L))
    val plan3 = p3.queryExecution.executedPlan.toString
    assert(plan3.contains("PushedFilters") &&
      plan3.contains("GreaterThan(id,30"),
      s"P3 watermark did not push into the JDBC scan:\n$plan3")
    assert(p3.count() == 10)

    Tables.jdbcAppend((1 to 20).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00")))
      .toDF("id", "lm"), url, "t_pushdown_lm")
    val p4 = graft.sync.Watermark.modifiedSince(
      Tables.jdbcTable(spark, url, "t_pushdown_lm"), "lm",
      Some(java.sql.Timestamp.valueOf("2024-01-01 00:15:00")))
    val plan4 = p4.queryExecution.executedPlan.toString
    assert(plan4.contains("PushedFilters") &&
      plan4.contains("GreaterThanOrEqual(lm,"),
      s"P4 watermark did not push into the JDBC scan:\n$plan4")
    assert(p4.count() == 6)
  }

  test("append mode accumulates, matching warehouse bulk-insert semantics") {
    seeded("t_append")
    Tables.jdbcAppend(Seq((100L, "x", 1.0)).toDF("id", "name", "amount"),
      url, "t_append")
    assert(Tables.jdbcTable(spark, url, "t_append").count() == 41)
  }
}
