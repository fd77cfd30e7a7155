package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.PgTypeMapper

/** Unit + property tests for the pg→Spark type mapping (SURVEY §1.3),
  * mirroring the reference's three mapping tables
  * (clickhouse_backend.py:49-86, duckdb_backend.py:33-67,
  * snowflake_backend.py:78-109).
  */
class PgTypeMapperSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)

  test("totality: any string maps to some Spark type, never throws") {
    check(Prop.forAll { (s: String) =>
      PgTypeMapper.toSparkType(s) != null
    })
  }

  test("reference mapping table") {
    val expected = Seq(
      "boolean" -> BooleanType,
      "text" -> StringType,
      "character varying(64)" -> StringType,
      "varchar" -> StringType,
      "jsonb" -> StringType,
      "uuid" -> StringType,
      "park_type_enum" -> StringType,
      "time without time zone" -> StringType,
      "timestamp without time zone" -> TimestampType,
      "timestamp with time zone" -> TimestampType,
      "date" -> DateType,
      "bigint" -> LongType,
      "bigserial" -> LongType,
      "integer" -> LongType, // reference maps int → Int64/BIGINT
      "serial" -> LongType,
      "smallint" -> IntegerType,
      "real" -> DoubleType,
      "double precision" -> DoubleType,
      "numeric" -> DoubleType,
      "integer[]" -> StringType, // arrays stringified (README.md:250-254)
      "text[]" -> StringType,
      "some_unknown_type" -> StringType)
    expected.foreach { case (pg, dt) =>
      assert(PgTypeMapper.toSparkType(pg) == dt, s"for pg type '$pg'")
    }
  }

  test("numeric/decimal precision-scale forms") {
    assert(PgTypeMapper.toSparkType("numeric(10,2)") == DecimalType(10, 2))
    assert(PgTypeMapper.toSparkType("decimal(10,2)") == DecimalType(10, 2))
    assert(PgTypeMapper.toSparkType("numeric(5)") == DecimalType(5, 0))
    // beyond Spark's max precision → degrade to double, like the reference
    assert(PgTypeMapper.toSparkType("numeric(60,10)") == DoubleType)
    // scale > precision (legal in pg 15+) must degrade, not throw
    assert(PgTypeMapper.toSparkType("numeric(2,5)") == DoubleType)
    // out-of-Int digit counts must degrade, not throw NumberFormatException
    assert(PgTypeMapper.toSparkType("numeric(99999999999,0)") == DoubleType)
  }

  test("sanitizeName: spaces → underscores, quotes stripped") {
    assert(PgTypeMapper.sanitizeName("park state") == "park_state")
    assert(PgTypeMapper.sanitizeName("\"park state\"") == "park_state")
    assert(PgTypeMapper.sanitizeName("plain") == "plain")
    check(Prop.forAll { (s: String) =>
      !PgTypeMapper.sanitizeName(s).contains(" ")
    })
  }

  test("toStructType: PK columns non-nullable, order preserved") {
    val st = PgTypeMapper.toStructType(
      Seq("id" -> "bigint", "name" -> "text", "park state" -> "varchar"),
      primaryKey = Seq("id"))
    assert(st.fieldNames.toSeq == Seq("id", "name", "park_state"))
    assert(!st("id").nullable)
    assert(st("name").nullable)
    assert(st("park_state").nullable)
  }

  test("parseSchemaDump: psql \\d shape with PK index line") {
    val dump =
      """ Column  |            Type             | Collation | Nullable | Default
        |---------+-----------------------------+-----------+----------+--------
        | id      | bigint                      |           | not null |
        | name    | text                        |           |          |
        | park state | character varying(64)    |           |          |
        |Indexes:
        |    "users_pkey" PRIMARY KEY, btree (id)
        |""".stripMargin
    val (cols, pk) = PgTypeMapper.parseSchemaDump(dump)
    assert(cols.map(_._1) == Seq("id", "name", "park state"))
    assert(cols.toMap.apply("park state") == "character varying(64)")
    assert(pk == Seq("id"))
  }

  test("parseSchemaDump keeps real columns whose NAME contains 'column' " +
    "(only the exact header row is filtered)") {
    val dump =
      """ Column       | Type    | Collation | Nullable | Default
        |--------------+---------+-----------+----------+--------
        | id           | bigint  |           | not null |
        | column_count | integer |           |          |
        |""".stripMargin
    val (cols, _) = PgTypeMapper.parseSchemaDump(dump)
    assert(cols.map(_._1) == Seq("id", "column_count"),
      s"substring header filter must not eat real columns: $cols")
  }
}
