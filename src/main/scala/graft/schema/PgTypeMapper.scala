package graft.schema

import org.apache.spark.sql.types._

/** Postgres-type → Spark `DataType` mapping, generalizing the reference's three
  * per-warehouse mapping tables (reference: pgwarehouse/clickhouse_backend.py:49-86,
  * duckdb_backend.py:33-67, snowflake_backend.py:78-109). Matching is by string
  * prefix of the pg type, exactly like the reference's `str.startswith` chains.
  *
  * Also carries the reference's schema-level semantics:
  *  - nullability: PK columns non-null, everything else nullable
  *    (clickhouse_backend.py:144-147 `Nullable(T)` wrapping);
  *  - column-name sanitization: spaces → underscores
  *    (clickhouse_backend.py:118-119, duckdb_backend.py:72-76);
  *  - unknown types degrade to string with a warning rather than failing
  *    (clickhouse_backend.py:76-77).
  *
  * Pure function of its inputs — property-tested in PgTypeMapperSpec.
  */
object PgTypeMapper {

  /** Total: any pg type string maps to some Spark type (unknown → StringType). */
  def toSparkType(pgType: String): DataType = {
    val t = pgType.trim.toLowerCase
    // Array types are stringified for fidelity with the reference
    // (clickhouse_backend.py:79-86 stringifies `T[]`; README.md:250-254).
    if (t.endsWith("[]")) StringType
    else if (t.endsWith("_enum") || t.endsWith("enum")) StringType
    else if (t.startsWith("boolean") || t.startsWith("bool")) BooleanType
    else if (t.startsWith("character") || t.startsWith("varchar") ||
             t.startsWith("char") || t.startsWith("jsonb") ||
             t.startsWith("json") || t.startsWith("text") ||
             t.startsWith("uuid") || t.startsWith("year")) StringType
    // time-of-day: Spark (pre-TimeType) keeps string, like ClickHouse keeps String
    else if (t.startsWith("time ") || t == "time" ||
             t.startsWith("time(") || t.startsWith("time without") ||
             t.startsWith("time with")) StringType
    else if (t.startsWith("timestamp")) TimestampType
    else if (t.startsWith("date")) DateType
    else if (t.startsWith("bigint") || t.startsWith("int8") ||
             t.startsWith("bigserial") || t.startsWith("serial8")) LongType
    else if (t.startsWith("smallint") || t.startsWith("int2")) IntegerType
    else if (t.startsWith("integer") || t.startsWith("int") ||
             t.startsWith("serial")) LongType // reference maps int → Int64/BIGINT
    else if (t.startsWith("numeric") || t.startsWith("decimal")) parseNumeric(t)
    else if (t.startsWith("real") || t.startsWith("float4")) DoubleType
    else if (t.startsWith("double") || t.startsWith("float")) DoubleType
    else StringType // unknown → string + caller logs (reference warns)
  }

  /** `numeric(p,s)` / `decimal(p,s)` → DecimalType(p,s) when declared
    * (`numeric(p)` → scale 0, per SQL); bare `numeric` degrades to DoubleType
    * exactly like every reference backend does (duckdb_backend.py:50).
    */
  private def parseNumeric(t: String): DataType = {
    val ps = "(?:numeric|decimal)\\((\\d+)(?:\\s*,\\s*(\\d+))?\\)".r
    t match {
      // scale > precision (legal in Postgres 15+) or out-of-Int digits
      // would make DecimalType/toInt throw; degrade like any other
      // unrepresentable numeric
      case ps(p, s) if p.length <= 9 && Option(s).forall(_.length <= 9) &&
          p.toInt <= 38 && Option(s).map(_.toInt).getOrElse(0) <= p.toInt =>
        DecimalType(p.toInt, Option(s).map(_.toInt).getOrElse(0))
      case _ => DoubleType
    }
  }

  /** Space → underscore, as all three reference backends do; additionally strips
    * quoting and lowercases nothing (names pass through otherwise — Spark handles
    * arbitrary names via backticks).
    */
  def sanitizeName(name: String): String =
    name.stripPrefix("\"").stripSuffix("\"").replace(" ", "_")

  /** Full schema construction: ordered (name → pgtype) + PK list → StructType.
    * PK columns are non-nullable (clickhouse_backend.py:144-147).
    */
  def toStructType(columns: Seq[(String, String)], primaryKey: Seq[String]): StructType = {
    val pk = primaryKey.map(sanitizeName).toSet
    StructType(columns.map { case (rawName, pgType) =>
      val name = sanitizeName(rawName)
      StructField(name, toSparkType(pgType), nullable = !pk.contains(name))
    })
  }

  /** Parse the reference's `psql \d`-style schema dump format: lines of
    * `name | type | collation | nullable | default` plus an index line containing
    * `PRIMARY KEY, btree (col, ...)` (reference pgwarehouse.py:305-335).
    */
  def parseSchemaDump(dump: String): (Seq[(String, String)], Seq[String]) = {
    val lines = dump.linesIterator.toSeq
    val pkRe = ".*PRIMARY KEY.*\\((.*)\\).*".r
    val pk = lines.collectFirst { case pkRe(cols) =>
      cols.split(",").map(_.trim).toSeq
    }.getOrElse(Nil)
    val cols = lines.flatMap { line =>
      val parts = line.split("\\|").map(_.trim)
      // exact header match, NOT substring: a real column named
      // column_count / source_column would otherwise be silently dropped
      // from the parsed schema and every downstream load would misbind
      if (parts.length >= 2 && parts(0).nonEmpty && parts(1).nonEmpty &&
          parts(0).toLowerCase != "column") Some(parts(0) -> parts(1))
      else None
    }
    (cols, pk)
  }
}
