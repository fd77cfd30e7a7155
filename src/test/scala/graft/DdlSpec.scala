package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.WarehouseDdl
import graft.schema.WarehouseDdl.{ClickHouse, DuckDb, Snowflake}

/** DDL generation against the reference's own test fixtures
  * (reference: pgwarehouse/tests/pg_setup.sql — users10 / my_orders /
  * local_parks), asserting the exact statements its backends would issue:
  * ClickHouse MergeTree-vs-StripeLog + Nullable wrapping
  * (clickhouse_backend.py:143-159), DuckDB column-level PRIMARY KEY
  * (duckdb_backend.py:72-92), Snowflake reserved-word quoting + staged
  * MERGE (snowflake_backend.py:111-115, :199-208).
  *
  * Column pg-types are written as `psql \d` reports them at runtime
  * (serial → integer, float → double precision, enum → its type name).
  */
class DdlSpec extends AnyFunSuite {

  private val users10 = Seq(
    "id" -> "integer", "name" -> "text",
    "email" -> "character varying", "age" -> "integer")

  private val myOrders = Seq(
    "id" -> "bigint", "user_id" -> "integer", "order_date" -> "date",
    "order_amount" -> "double precision",
    "order_updated" -> "timestamp without time zone")

  private val localParks = Seq(
    "park_name" -> "text", "park_type" -> "park_type",
    "park_size" -> "integer", "park_location_lat" -> "double precision",
    "park_location_lon" -> "double precision",
    "park state" -> "character varying")

  test("clickhouse: PK table gets MergeTree ordered by the key, " +
    "non-PK columns Nullable") {
    assert(ClickHouse.createTable("users10", users10, Seq("id")) ==
      "CREATE TABLE IF NOT EXISTS users10 (id Int64, name Nullable(String), " +
        "email Nullable(String), age Nullable(Int64)) " +
        "ENGINE = MergeTree() ORDER BY (id);")
    assert(ClickHouse.createTable("my_orders", myOrders, Seq("id")) ==
      "CREATE TABLE IF NOT EXISTS my_orders (id Int64, " +
        "user_id Nullable(Int64), order_date Nullable(DateTime), " +
        "order_amount Nullable(Float64), " +
        "order_updated Nullable(DateTime64(3))) " +
        "ENGINE = MergeTree() ORDER BY (id);")
  }

  test("clickhouse: keyless table falls back to StripeLog; spaces and " +
    "unknown enum types degrade like the reference") {
    val sql = ClickHouse.createTable("local_parks", localParks, Nil)
    assert(sql.endsWith("ENGINE = StripeLog;"))
    assert(sql.contains("park_state Nullable(String)"), "space → underscore")
    assert(sql.contains("park_type Nullable(String)"),
      "unknown enum type name degrades to String")
  }

  test("duckdb: column-level PRIMARY KEY, TIMESTAMP for date, DOUBLE for float") {
    assert(DuckDb.createTable("my_orders", myOrders, Seq("id")) ==
      "CREATE TABLE IF NOT EXISTS my_orders (id BIGINT PRIMARY KEY, " +
        "user_id BIGINT, order_date TIMESTAMP, order_amount DOUBLE, " +
        "order_updated TIMESTAMP);")
    assert(DuckDb.createTable("users10", users10, Seq("id")) ==
      "CREATE TABLE IF NOT EXISTS users10 (id BIGINT PRIMARY KEY, " +
        "name VARCHAR, email VARCHAR, age BIGINT);")
  }

  test("duckdb: composite keys render ONE table-level PRIMARY KEY " +
    "constraint (per-column PRIMARY KEY twice is invalid DuckDB SQL)") {
    val sql = DuckDb.createTable("li", myOrders, Seq("id", "user_id"))
    assert(sql.endsWith("PRIMARY KEY (id, user_id));"), sql)
    assert(!sql.contains("BIGINT PRIMARY KEY"),
      "no column-level PK marker may remain in the composite form")
  }

  test("snowflake: space-bearing column names are quoted (the reference " +
    "emits them bare, which the server rejects)") {
    val sql = Snowflake.createTable("local_parks", localParks, Nil)
    assert(sql.contains("\"park state\" STRING"),
      s"space column must be quoted, got: $sql")
  }

  test("snowflake: no PK clause, reserved column names double-quoted") {
    assert(Snowflake.createTable("users10", users10, Seq("id")) ==
      "CREATE TABLE IF NOT EXISTS users10 (id BIGINT, name STRING, " +
        "email STRING, age BIGINT);")
    val reserved = Seq("id" -> "integer", "order" -> "text",
      "from" -> "text", "current_date" -> "date")
    assert(Snowflake.createTable("t", reserved, Seq("id")) ==
      "CREATE TABLE IF NOT EXISTS t (id BIGINT, \"order\" STRING, " +
        "\"from\" STRING, \"current_date\" DATETIME);")
  }

  test("snowflake: staged MERGE upserts on the key, updates every column") {
    val sql = Snowflake.mergeFromStage("users10",
      Seq("id", "name", "order"), Seq("id"), "chunk0001.csv.gz")
    assert(sql.contains("MERGE INTO users10 USING"))
    assert(sql.contains("PATTERN => 'chunk0001.csv.gz'"))
    assert(sql.contains("ON csvsrc.id = users10.id"))
    assert(sql.contains(
      "UPDATE SET users10.id = csvsrc.id, users10.name = csvsrc.name, " +
        "users10.\"order\" = csvsrc.\"order\""))
    assert(sql.contains(
      "INSERT (id, name, \"order\") VALUES (csvsrc.id, csvsrc.name, " +
        "csvsrc.\"order\")"))
    // composite keys generalize the reference's single-key ON clause
    val comp = Snowflake.mergeFromStage("t", Seq("a", "b", "v"),
      Seq("a", "b"), "c.csv")
    assert(comp.contains("ON csvsrc.a = t.a AND csvsrc.b = t.b"))
  }

  test("StructType-driven DDL routes through the same dialect tables") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("amount", DecimalType(12, 2)),
      StructField("ts", TimestampType)))
    assert(ClickHouse.createTable("t", schema, Seq("id")) ==
      "CREATE TABLE IF NOT EXISTS t (id Int64, name Nullable(String), " +
        "amount Nullable(Float64), ts Nullable(DateTime64(3))) " +
        "ENGINE = MergeTree() ORDER BY (id);")
    assert(DuckDb.createTable("t", schema, Seq("id")) ==
      "CREATE TABLE IF NOT EXISTS t (id BIGINT PRIMARY KEY, name VARCHAR, " +
        "amount DOUBLE, ts TIMESTAMP);")
  }

  test("every dialect degrades unknown types instead of failing") {
    for (d <- WarehouseDdl.dialects.values) {
      val sql = d.createTable("t", Seq("x" -> "hstore", "y" -> "int4range"), Nil)
      assert(sql.startsWith("CREATE TABLE IF NOT EXISTS t ("))
    }
    assert(ClickHouse.dropTable("t") == "DROP TABLE IF EXISTS t")
  }
}
