package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function surface (reference §2.8): lenient timestamp parsing,
  * size pretty-printing, name sanitization. All built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs in any hot path.
  */
object Functions {

  /** F1: ClickHouse `parseDateTimeBestEffortOrNull` analog
    * (clickhouse_backend.py:134-138 + date_time_input_format='best_effort').
    * A deterministic coalesce over an explicit format list — first format that
    * parses wins, null if none do. Each `to_timestamp(c, fmt)` is a codegen'd
    * expression; the coalesce stays inside whole-stage codegen.
    */
  def bestEffortTimestamp(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd")),
    try_to_timestamp(c, lit("M/d/yyyy H:m:s")),
    try_to_timestamp(c, lit("M/d/yyyy")),
    try_to_timestamp(c, lit("yyyy-M-d")),
    try_to_timestamp(c)
  )

  /** F2: `pg_size_pretty(bytes)` (pgwarehouse.py:220) — cosmetic, driver-side. */
  def pgSizePretty(bytes: Long): String = {
    val units = Seq("bytes", "kB", "MB", "GB", "TB", "PB")
    var (v, i) = (bytes.toDouble, 0)
    while (math.abs(v) >= 1024 && i < units.size - 1) { v /= 1024; i += 1 }
    // Locale.ROOT: the f-interpolator formats with the DEFAULT locale, so
    // a comma-decimal JVM (-Duser.language=de) would print "1,5 kB" and
    // diverge from pg_size_pretty's dot form
    if (i == 0) s"$bytes ${units(0)}"
    else String.format(java.util.Locale.ROOT, "%.1f %s",
      Double.box(v), units(i))
  }

  /** F3: `to_char(n,'FM999,999,999,999')` analog. */
  def formatCount(c: Column): Column = format_number(c, 0)

  /** Exact money arithmetic for oracle-comparable aggregates: term-wise round
    * to cents then integer-sum. Summation of longs is order-independent, so
    * Spark's partial aggregation and DuckDB's sequential sum agree bit-for-bit
    * — unlike double sums (SURVEY §7.4 determinism note).
    */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** F7 `now()` — the reference's sole use is stamping mutated rows before
    * an incremental sync (`UPDATE ... SET order_updated = now()`,
    * tests/test_postgres.py:173-175): set `lmCol` to the QUERY-CONSTANT
    * `current_timestamp()` (the same per-statement-constant contract as
    * Postgres `now()`) on rows matching `condition`, leaving the rest
    * untouched. Non-deterministic by nature, so it is verified by
    * SyncE2ESpec's incremental-sync shape (stamped rows move, stamp is
    * one instant, stamp ≥ the pre-mutation clock), not the DuckDB hash
    * gate.
    */
  def touchNow(df: org.apache.spark.sql.DataFrame, lmCol: String,
               condition: Column): org.apache.spark.sql.DataFrame = {
    val dt = df.schema(lmCol).dataType
    // guard: cast(timestamp AS bigint) yields epoch SECONDS — on a
    // numeric last-modified column holding us/ns (this repo's ns-as-long
    // parquet convention) the stamp would sort ~1e6-1e9 BELOW the sync
    // watermark and the mutation would silently never sync. Restore the
    // typed column first (Tables.table does) or stamp it explicitly.
    require(dt.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
      dt.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType] ||
      dt.isInstanceOf[org.apache.spark.sql.types.DateType],
      s"touchNow: '$lmCol' is ${dt.simpleString}, not a timestamp/date — " +
        "a numeric epoch column has ambiguous units (s/ms/us/ns); stamp " +
        "it explicitly in its own unit instead")
    df.withColumn(lmCol,
      when(condition, current_timestamp().cast(dt)).otherwise(col(lmCol)))
  }
}
