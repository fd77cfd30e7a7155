package graft.schema

import org.apache.spark.sql.types._

/** Dialect-aware warehouse DDL generation: pure string functions from a
  * (columns, primary-key) schema to `CREATE TABLE` / `DROP TABLE` / staged
  * `MERGE` statements for the three reference warehouses. Mirrors the
  * reference's per-backend SQL generation (reference:
  * pgwarehouse/clickhouse_backend.py:143-159 MergeTree-vs-StripeLog engine
  * choice + `Nullable(T)` wrapping, duckdb_backend.py:72-92 column-level
  * `PRIMARY KEY`, snowflake_backend.py:111-133 reserved-word quoting and
  * :199-208 staged `MERGE INTO`), with zero connectivity required — the
  * strings are unit-testable and feed `Tables.jdbcAppend`-style executors.
  *
  * Two entry points per dialect: from raw Postgres type names (the
  * reference's path — prefix-matched exactly like its `startswith` chains)
  * and from a Spark `StructType` (the Spark-native path, routed through the
  * same dialect tables so both agree).
  */
object WarehouseDdl {

  sealed trait Dialect {
    /** Dialect column type for a Postgres type name. */
    def colType(pgType: String): String
    /** Dialect column type for a Spark type. */
    def colType(dt: DataType): String = colType(pgName(dt))
    /** Dialect-legal column name. */
    def quoteName(raw: String): String
    /** Full CREATE TABLE for ordered (name, pgType) columns + PK columns. */
    def createTable(table: String, columns: Seq[(String, String)],
                    primaryKey: Seq[String]): String
    def createTable(table: String, schema: StructType,
                    primaryKey: Seq[String]): String =
      createTable(table, schema.fields.toSeq.map(f => f.name -> pgName(f.dataType)),
        primaryKey)
    def dropTable(table: String): String = s"DROP TABLE IF EXISTS $table"
  }

  /** Spark type → canonical Postgres type name, so StructType-driven DDL
    * reuses the same dialect tables as the pg-dump-driven path.
    */
  def pgName(dt: DataType): String = dt match {
    case BooleanType            => "boolean"
    case ShortType              => "smallint"
    case IntegerType | LongType => "bigint"
    case FloatType | DoubleType => "double precision"
    case d: DecimalType         => s"numeric(${d.precision},${d.scale})"
    case DateType               => "date"
    case TimestampType          => "timestamp without time zone"
    case _: ArrayType           => "text[]"
    case _                      => "text"
  }

  /** ClickHouse: MergeTree ordered by the PK when one exists, StripeLog
    * otherwise; every non-PK column wrapped `Nullable(T)` (reference
    * clickhouse_backend.py:143-159).
    */
  case object ClickHouse extends Dialect {
    // prefix chain mirrors clickhouse_backend.py:49-77
    def colType(pgType: String): String = {
      val t = pgType.trim.toLowerCase
      if (t.endsWith("[]")) "String"
      else if (t.endsWith("_enum")) "String"
      else if (t.startsWith("boolean")) "Bool"
      else if (t.startsWith("character") || t.startsWith("jsonb") || t == "text") "String"
      else if (t.startsWith("time ")) "String"
      else if (t.startsWith("date")) "DateTime"
      else if (t.startsWith("timestamp")) "DateTime64(3)"
      else if (t.startsWith("int") || t.startsWith("bigint")) "Int64"
      else if (t.startsWith("smallint")) "Int32"
      else if (t.startsWith("numeric") || t.startsWith("real") ||
               t.startsWith("double")) "Float64"
      else if (t == "year") "String"
      else if (t == "uuid") "String"
      else "String" // unknown degrades, like the reference's warning path
    }

    def quoteName(raw: String): String = raw.replace(" ", "_")

    def createTable(table: String, columns: Seq[(String, String)],
                    primaryKey: Seq[String]): String = {
      val pk = primaryKey.toSet
      val cols = columns.map { case (name, pgType) =>
        val t = colType(pgType)
        val wrapped = if (pk.contains(name)) t else s"Nullable($t)"
        s"${quoteName(name)} $wrapped"
      }.mkString(", ")
      val engine =
        if (primaryKey.nonEmpty)
          s"ENGINE = MergeTree() ORDER BY (${primaryKey.map(quoteName).mkString(", ")})"
        else "ENGINE = StripeLog"
      s"CREATE TABLE IF NOT EXISTS $table ($cols) $engine;"
    }
  }

  /** DuckDB: plain ANSI types with a column-level PRIMARY KEY suffix
    * (reference duckdb_backend.py:72-92).
    */
  case object DuckDb extends Dialect {
    // prefix chain mirrors duckdb_backend.py:33-61 (incl. its `_enum` →
    // "String" quirk, which DuckDB accepts as a VARCHAR alias)
    def colType(pgType: String): String = {
      val t = pgType.trim.toLowerCase
      if (t.endsWith("[]")) "VARCHAR"
      else if (t.endsWith("_enum")) "String"
      else if (t.startsWith("boolean")) "BOOLEAN"
      else if (t.startsWith("character") || t.startsWith("jsonb") || t == "text") "VARCHAR"
      else if (t.startsWith("time ")) "TIMESTAMP"
      else if (t.startsWith("date")) "TIMESTAMP"
      else if (t.startsWith("timestamp")) "TIMESTAMP"
      else if (t.startsWith("int") || t.startsWith("bigint")) "BIGINT"
      else if (t.startsWith("smallint")) "INTEGER"
      else if (t.startsWith("numeric") || t.startsWith("real") ||
               t.startsWith("double")) "DOUBLE"
      else if (t == "year") "VARCHAR"
      else if (t == "uuid") "UUID"
      else "VARCHAR"
    }

    def quoteName(raw: String): String = raw.replace(" ", "_")

    def createTable(table: String, columns: Seq[(String, String)],
                    primaryKey: Seq[String]): String = {
      // composite keys render a TABLE-level constraint: one column-level
      // PRIMARY KEY per key column is invalid DuckDB SQL ("multiple
      // primary keys"). Lives here in the shared dialect — the ddl CLI
      // command and the live backend must print/execute the same legal
      // statement, not each fix it separately.
      if (primaryKey.size > 1) {
        val cols = columns.map { case (name, pgType) =>
          s"${quoteName(name)} ${colType(pgType)}"
        }.mkString(", ")
        val pk = primaryKey.map(quoteName).mkString(", ")
        s"CREATE TABLE IF NOT EXISTS $table ($cols, PRIMARY KEY ($pk));"
      } else {
        val pk = primaryKey.toSet
        val cols = columns.map { case (name, pgType) =>
          val suffix = if (pk.contains(name)) " PRIMARY KEY" else ""
          s"${quoteName(name)} ${colType(pgType)}$suffix"
        }.mkString(", ")
        s"CREATE TABLE IF NOT EXISTS $table ($cols);"
      }
    }
  }

  /** Snowflake: reserved column names double-quoted (reference
    * snowflake_backend.py:21,111-115); CREATE carries no PK clause — keys
    * matter only to the staged MERGE (snowflake_backend.py:199-208).
    */
  case object Snowflake extends Dialect {
    // snowflake_backend.py:21
    val ReservedColNames: Set[String] =
      Set("current_date", "order", "to", "from", "values", "start", "current")

    // prefix chain mirrors snowflake_backend.py:78-109
    def colType(pgType: String): String = {
      val t = pgType.trim.toLowerCase
      if (t.endsWith("[]")) "String"
      else if (t.endsWith("_enum")) "STRING"
      else if (t.startsWith("boolean")) "BOOLEAN"
      else if (t.startsWith("character") || t.startsWith("jsonb") || t == "text") "STRING"
      else if (t.startsWith("time ")) "TIME"
      else if (t.startsWith("date")) "DATETIME"
      else if (t.startsWith("timestamp")) "TIMESTAMP"
      else if (t.startsWith("int") || t.startsWith("bigint")) "BIGINT"
      else if (t.startsWith("smallint")) "SMALLINT"
      else if (t.startsWith("numeric") || t.startsWith("real") ||
               t.startsWith("double")) "NUMERIC"
      else if (t == "year") "String"
      else "String"
    }

    // reserved words are quoted like the reference; names with spaces are
    // ALSO quoted (the reference leaves them bare — snowflake_backend.py
    // :111-115 — which Snowflake rejects as a syntax error; quoting is the
    // strictly-safer superset of its behavior)
    def quoteName(raw: String): String =
      if (ReservedColNames.contains(raw.toLowerCase) || raw.contains(" "))
        "\"" + raw + "\""
      else raw

    def createTable(table: String, columns: Seq[(String, String)],
                    primaryKey: Seq[String]): String = {
      val cols = columns
        .map { case (name, pgType) => s"${quoteName(name)} ${colType(pgType)}" }
        .mkString(", ")
      s"CREATE TABLE IF NOT EXISTS $table ($cols);"
    }

    /** Server-side upsert from a staged CSV into the table — the statement
      * the reference issues per chunk (snowflake_backend.py:199-208),
      * generalized to composite keys. `stagePattern` is the staged-file
      * regex (e.g. the chunk's basename).
      */
    def mergeFromStage(table: String, columns: Seq[String],
                       keyCols: Seq[String], stagePattern: String,
                       fileFormat: String = "pgw_csv_format"): String = {
      require(keyCols.nonEmpty, "MERGE needs at least one key column")
      val colList = columns.map(quoteName).mkString(", ")
      val on = keyCols
        .map(k => s"csvsrc.${quoteName(k)} = $table.${quoteName(k)}")
        .mkString(" AND ")
      val updates = columns
        .map(c => s"$table.${quoteName(c)} = csvsrc.${quoteName(c)}")
        .mkString(", ")
      val values = columns.map(c => s"csvsrc.${quoteName(c)}").mkString(", ")
      s"""MERGE INTO $table USING
         |  (SELECT $colList FROM @%$table(FILE_FORMAT => '$fileFormat', PATTERN => '$stagePattern')) csvsrc
         |  ON $on
         |  WHEN MATCHED THEN UPDATE SET $updates
         |  WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($values)""".stripMargin
    }
  }

  val dialects: Map[String, Dialect] =
    Map("clickhouse" -> ClickHouse, "duckdb" -> DuckDb, "snowflake" -> Snowflake)
}
