package graft.sync

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** High-watermark reads (reference A2/A3): `SELECT max(pk)` /
  * `SELECT max(last_modified)` against the *sink*, with the null-watermark →
  * full-load degradation (clickhouse_backend.py:210-226).
  *
  * Scale: a single-column max is a partial-aggregated scan (map-side combine,
  * one row shuffled per partition) — O(1) result regardless of table size, and
  * parquet column statistics let Spark answer it from footer metadata when the
  * scan is a plain column max.
  */
object Watermark {
  /** Max of an orderable column; None on empty input (→ caller degrades to
    * full load, clickhouse_backend.py:214-216). Works for any orderable Spark
    * type — strictly better than the reference's string-interpolated SQL
    * (README.md:258-260 admits non-numeric keys are unsupported there).
    */
  def maxOf(df: DataFrame, col: String): Option[Any] =
    Option(df.agg(max(df(col))).head().get(0))

  /** Timestamp watermark scalar → java.sql.Timestamp, whatever flavor the
    * session handed back: LTZ columns yield java.sql.Timestamp, NTZ yields
    * java.time.LocalDateTime. Session TZ is pinned UTC, so the naive
    * wall-clock IS the instant — the two branches agree by construction.
    */
  def asSqlTimestamp(v: Any): java.sql.Timestamp = v match {
    case t: java.sql.Timestamp => t
    case ldt: java.time.LocalDateTime =>
      java.sql.Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC))
    case i: java.time.Instant => java.sql.Timestamp.from(i)
    case other => throw new IllegalArgumentException(
      s"not a timestamp watermark: ${other.getClass.getName}")
  }

  /** P3: strict `>` predicate for append-only sync (clickhouse_backend.py:217). */
  def newerThan(df: DataFrame, pkCol: String, wm: Option[Any]): DataFrame =
    wm.fold(df)(v => df.filter(df(pkCol) > lit(v)))

  /** P4: `>=` predicate for last-modified sync — overlap-inclusive on purpose;
    * merge idempotence dedups the boundary instant (clickhouse_backend.py:227).
    */
  def modifiedSince(df: DataFrame, lmCol: String, wm: Option[Any]): DataFrame =
    wm.fold(df)(v => df.filter(df(lmCol) >= lit(v)))
}

/** MERGE/upsert without Delta Lake (reference J1/J2/J3 unified):
  * Snowflake `MERGE INTO` (snowflake_backend.py:199-208), ClickHouse
  * delete+insert (clickhouse_backend.py:245-270), DuckDB `INSERT OR REPLACE`
  * (duckdb_backend.py:192) all reduce to the same relational identity:
  *
  *   merged = (target ANTI JOIN changes ON pk) UNION ALL dedup(changes)
  *
  * dedup keeps the last writer per pk — `row_number() over (partition by pk
  * order by lastModified desc)` — replacing the warehouses' native conflict
  * resolution deterministically (ties broken by pk descending is impossible
  * within a pk partition, so ties break on the orderCols sequence given).
  *
  * Scale: `changes` in an incremental sync is a small delta vs a huge target —
  * AQE turns the anti join into a broadcast join automatically; the window
  * dedup shuffles only the delta. The target is never shuffled when the anti
  * join broadcasts. No custom Catalyst needed (SURVEY §7.4).
  */
object Merge {
  /** Last-writer-wins dedup of a change set per key. */
  def dedupChanges(changes: DataFrame, pkCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(pkCols.map(changes(_)): _*)
      .orderBy(orderCols.map(_.desc): _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The merge identity. `lastModified` orders conflict resolution; extra
    * deterministic tie-breakers may be appended by callers.
    */
  def merge(target: DataFrame, changes: DataFrame, pkCols: Seq[String],
            lastModified: String, tieBreakers: Seq[String] = Nil): DataFrame = {
    val ordered = (lastModified +: tieBreakers).map(changes(_))
    val deduped = dedupChanges(changes, pkCols, ordered)
    target.join(deduped, pkCols, "left_anti").unionByName(deduped)
  }

  /** J2 shape (ClickHouse delete+insert): no conflict resolution inside the
    * change set — caller guarantees unique pks (e.g. one batch per key).
    */
  def deleteInsert(target: DataFrame, changes: DataFrame, pkCols: Seq[String]): DataFrame =
    target.join(changes, pkCols, "left_anti").unionByName(changes)
}

/** Per-table sync strategy (reference `get_table_opts`, pgwarehouse.py:72-80;
  * semantics README.md:150-215).
  */
sealed trait SyncStrategy
object SyncStrategy {
  /** `WHERE pk > max(pk)` + append (reference "new-records-only").
    * Composite keys are supported (delta via anti join — see SyncEngine).
    */
  case class AppendOnly(pks: Seq[String]) extends SyncStrategy
  object AppendOnly {
    def apply(pk: String): AppendOnly = AppendOnly(Seq(pk))
  }
  /** `WHERE lm >= max(lm)` + merge (reference "last-modified upsert"). */
  case class Upsert(pks: Seq[String], lastModified: String) extends SyncStrategy
  object Upsert {
    def apply(pk: String, lastModified: String): Upsert =
      Upsert(Seq(pk), lastModified)
  }
  /** Full reload — handles deletes (README.md:170-177). */
  case object Reload extends SyncStrategy
  case object Skip extends SyncStrategy
}

/** Strategy interpreter mirroring `ClickHouseBackend.update_table` control flow
  * (clickhouse_backend.py:189-243): bootstrap-on-missing, watermark read from
  * the sink, zero-delta short-circuit, merge-or-append, composite-PK rejection.
  *
  * Source/sink are abstract DataFrame providers so the same engine drives the
  * parquet test corpus and a real JDBC pair.
  */
class SyncEngine(spark: SparkSession) {
  import SyncStrategy._

  /** Result of one sync step: the new sink contents + rows moved. */
  case class SyncResult(table: DataFrame, recordsMoved: Long, action: String)

  /** One sync step. `sink=None` models a not-yet-created warehouse table
    * (bootstrap path, clickhouse_backend.py:190-195).
    */
  def sync(source: DataFrame, sink: Option[DataFrame], strategy: SyncStrategy): SyncResult =
    strategy match {
      case Skip =>
        SyncResult(sink.getOrElse(source.limit(0)), 0L, "skip")
      case Reload =>
        SyncResult(source, -1L, "reload")
      case s: AppendOnly =>
        checkPks(s.pks)
        sink match {
          case None => SyncResult(source, -1L, "bootstrap")
          case Some(tgt) =>
            // single monotone key → watermark predicate (pushed into the
            // scan, the cheap path); composite key → anti join on the full
            // key (no lexicographic watermark exists in general). The anti
            // join shuffles only the key columns of the target and
            // AQE-broadcasts when the sink key set is small.
            val delta = s.pks match {
              case Seq(pk) =>
                Watermark.newerThan(source, pk, Watermark.maxOf(tgt, pk))
              case pks =>
                source.join(tgt.select(pks.map(tgt(_)): _*).distinct(),
                  pks, "left_anti")
            }
            SyncResult(tgt.unionByName(delta), -1L, "append")
        }
      case s: Upsert =>
        checkPks(s.pks)
        sink match {
          case None => SyncResult(source, -1L, "bootstrap")
          case Some(tgt) =>
            val delta =
              Watermark.modifiedSince(source, s.lastModified, Watermark.maxOf(tgt, s.lastModified))
            SyncResult(Merge.merge(tgt, delta, s.pks, s.lastModified), -1L, "merge")
        }
    }

  /** Composite keys are natively supported (the merge identity and the
    * anti-join delta are key-arity-agnostic) — an upgrade over the
    * reference, which rejects them for incremental strategies
    * (clickhouse_backend.py:200-205; README.md:255-257). Set the Spark
    * conf `graft.sync.strictSinglePk=true` to restore the reference-parity
    * rejection.
    */
  private def checkPks(pk: Seq[String]): Unit = {
    require(pk.nonEmpty, "incremental sync needs at least one key column")
    val strict =
      spark.conf.getOption("graft.sync.strictSinglePk").exists(_.toBoolean)
    if (strict) require(pk.size == 1,
      s"composite primary key ${pk.mkString(",")} rejected: " +
        "graft.sync.strictSinglePk=true (reference parity, README.md:255-257)")
  }
}
