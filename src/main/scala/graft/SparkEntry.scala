package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Analytics, Pipeline, Relational, TpcH}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one named query per implemented operator (SURVEY §2 inventory
  * + LLM-pipeline extensions) to a DataFrame builder over an sf directory;
  * `oracleSql` holds the DuckDB-equivalent SQL for every SQL-expressible one.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q4-ish: scan → filter → semi-join → grouped agg (SURVEY §7.3).
    */
  def entry(spark: SparkSession): DataFrame = {
    val sf = "/root/testdata/sf0.001"
    // via Tables.table, not raw spark.read: the loader repairs every parquet
    // timestamp flavor (ns-long, NTZ) to TimestampType even when the caller's
    // session lacks our LocalSession configs.
    val orders = graft.io.Tables.table(spark, sf, "orders")
    val lineitem = graft.io.Tables.table(spark, sf, "lineitem")
    orders
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private def allQ =
    Relational.all ++ TpcH.all ++ Analytics.all ++ Pipeline.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQ.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }

  /** How much of the Spark side's WORK the oracle SQL actually re-does —
    * the tag that keeps raw spark/oracle wall-clock ratios from being
    * misread (r14, VERDICT r13 ask #4). Values:
    *  - "full": the oracle computes the same result from the same inputs
    *    doing comparable work — the like-for-like baseline population;
    *  - "agg-only": the Spark side's measured work is dominated by I/O
    *    the oracle skips entirely (write+read-back roundtrips, versioned
    *    snapshot publishing) — the oracle only checks the final
    *    aggregate, so its wall-clock is not a baseline for the operator;
    *  - "batch-recompute": streaming twins — the oracle recomputes the
    *    final state as one batch query with no micro-batch, state-store,
    *    or checkpoint machinery, which is the very thing the Spark side
    *    is being measured doing.
    * Carried per query into the CHECK artifacts; tools/check.py --bench
    * segments its ratio report by this tag.
    */
  def oracleScope: Map[String, String] = {
    val aggOnly = Set("s2_csv_roundtrip", "s3_jsonl_roundtrip",
      "s4_orc_roundtrip", "x_time_travel", "x_snapshot_cdc",
      // writes the whole partitioned layout before scanning one
      // partition; the oracle only filters the source table
      "s5_partitioned_prune")
    queries.keys.map { k =>
      k -> (if (aggOnly(k)) "agg-only"
            else if (k.startsWith("stream_")) "batch-recompute"
            else "full")
    }.toMap
  }
}
