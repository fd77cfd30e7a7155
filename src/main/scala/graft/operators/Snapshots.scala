package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the release-audit operator. A training corpus
  * ships in versioned snapshots, and the question every release asks is
  * "what actually changed?": which documents were added, which were
  * removed, which were silently edited (same id, different content). The
  * diff is by content fingerprint, not byte comparison, so it composes
  * with the dedup family's md5 identity and never moves document text
  * through the join.
  *
  * Scale shape (the 100 TB contract): each snapshot is reduced map-side to
  * (id, md5) — a 100 TB text corpus becomes ~48 bytes/row before anything
  * shuffles — then a single hash-partitioned FULL OUTER equi-join on the
  * id classifies every document in one pass. No broadcast assumption
  * (both snapshots are corpus-sized); AQE handles the residual skew.
  * Presence is tracked by marker columns, not fingerprint nullness, so a
  * legitimately null text (fingerprint null) is never misread as an
  * absent row.
  */
object Snapshots {

  /** Per-document diff of two corpus snapshots: (id, status) with status ∈
    * added | removed | changed | unchanged. `added`/`removed` are from the
    * NEW snapshot's point of view. Null texts hash as empty so a null→null
    * edit is `unchanged` and null→text is `changed`.
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol),
      md5(coalesce(col(textCol), lit(""))).as("fp_o"), lit(true).as("in_o"))
    val n = newDf.select(col(idCol),
      md5(coalesce(col(textCol), lit(""))).as("fp_n"), lit(true).as("in_n"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("in_o").isNull, "added")
          .when(col("in_n").isNull, "removed")
          .when(col("fp_o") =!= col("fp_n"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Row-level change-data-feed between two keyed snapshots: one record
    * per CHANGED key with op ∈ insert | delete | update and the compared
    * value before/after — the export a downstream consumer replays to
    * stay in sync (what lakehouse formats call a change data feed,
    * derived here from any two immutable versions of
    * [[graft.io.Tables.publishVersion]]'s store). Update detection is
    * null-safe (`<=>`), so null→value and value→null are updates, not
    * misses. Unchanged keys are dropped BEFORE the output: the feed is
    * change-sized, never table-sized.
    *
    * Scale: ONE full-outer hash join on the key — both sides shuffle
    * once on the key they are already keyed by; for partitioned tables
    * prefer fingerprint-gated partition diff
    * ([[graft.io.Tables.refreshPartitions]]-style) to skip unchanged
    * partitions before this row-level pass.
    */
  def cdcDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
              valueCol: String): DataFrame = {
    val o = oldDf.select(keys.map(col) :+ col(valueCol).as("before_v") :+
      lit(true).as("in_o"): _*)
    val n = newDf.select(keys.map(col) :+ col(valueCol).as("after_v") :+
      lit(true).as("in_n"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("in_o").isNull, "insert")
          .when(col("in_n").isNull, "delete")
          .when(!(col("before_v") <=> col("after_v")), "update"))
      .where(col("op").isNotNull)
      .select(keys.map(col) ++
        Seq(col("op"), col("before_v"), col("after_v")): _*)
  }

  /** Per-source distribution-drift report between two corpus snapshots:
    * (source, n_old, n_new, drift_e4). Catches a truncation bug or a
    * boilerplate influx even when document counts look fine, by comparing
    * the SHAPE of each source's length distribution, not its size.
    *
    * Metric: L1 distance between the normalized log2-length histograms,
    * kept integer-exact by cross-multiplying instead of dividing —
    * `drift_e4 = Σ_buckets |a_i·N_new − b_i·N_old| · 10⁴ ÷ (N_old·N_new)`
    * — so the same value reproduces bit-for-bit in any engine. Range:
    * 0 (identical shapes) … 20000 (disjoint length regimes); a source
    * present in only one snapshot reports the 10000 midpoint. Buckets are
    * length-bit-counts (null text → −1), so a source spans ≤ ~40 buckets
    * regardless of corpus size.
    *
    * Scale shape: the two snapshots are tagged and unioned, so ONE
    * map-side-combined aggregate collapses the corpus to (source, bucket,
    * a, b) histogram rows — the only corpus-wide exchange, and it ships
    * combiner output, not rows. The per-source totals come from a window
    * over the histogram (≤ sources × 40 rows), never a self-join, and the
    * final collapse reuses the window's src partitioning. Nothing
    * downstream of the first groupBy is proportional to corpus size.
    */
  def corpusDrift(oldDf: DataFrame, newDf: DataFrame,
                  sourceCol: String, textCol: String): DataFrame = {
    def tagged(df: DataFrame, side: Int) = df
      .select(coalesce(col(sourceCol), lit("")).as("src"),
        coalesce(length(bin(length(col(textCol)).cast("long"))),
          lit(-1)).as("bucket"),
        lit(side).as("side"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
    tagged(oldDf, 0).unionByName(tagged(newDf, 1))
      .groupBy("src", "bucket")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("b"))
      .withColumn("n_old", sum(col("a")).over(w))
      .withColumn("n_new", sum(col("b")).over(w))
      .groupBy(col("src").as("source"), col("n_old"), col("n_new"))
      .agg(sum(abs(col("a") * col("n_new") - col("b") * col("n_old")))
        .as("l1"))
      .select(col("source"), col("n_old"), col("n_new"),
        // decimal(38,0) widen: l1 ≤ 2·n_old·n_new, so l1 * 10000
        // overflows BIGINT once a source holds ~3×10⁷ docs per snapshot
        // with divergent length regimes — the exact corpus-break this
        // audit exists to catch would have killed the audit job (ANSI)
        // at that moment. The oracle's sum() is already HUGEINT, so
        // values are unchanged; only Spark's intermediate widens.
        when(col("n_old") === 0 || col("n_new") === 0, lit(10000L))
          .otherwise(expr(
            """cast((cast(l1 as decimal(38,0)) * 10000) div
              |  (cast(n_old as decimal(38,0)) * n_new) as bigint)"""
              .stripMargin))
          .as("drift_e4"))
      .orderBy("source")
  }

  /** Slowly-changing-dimension TYPE-2 history from a change-event stream —
    * the warehouse pattern the reference's keyed upsert DESTROYS (an
    * upsert keeps only the last value; SCD2 keeps every value with its
    * validity interval). From (key, ts, value) change events, emit one
    * row per VALUE RUN: consecutive identical values collapse into a
    * single interval, a change opens a new one, and the latest interval
    * per key is open-ended (`valid_to` null, `is_current` true).
    *
    * Output: (key, value, valid_from, valid_to, is_current), ordered
    * within key by valid_from.
    *
    * Scale (100 TB of events): everything is windows over the SAME `key`
    * partitioning — the change detection (lag), the run numbering
    * (running count of change points), the per-run collapse (groupBy on
    * (key, run) — a superset of the window keys, so it rides the same
    * exchange), and the valid_to carry (lead over key again). ONE hash
    * exchange total, pinned in PlanAuditSpec. `tsTieCol` breaks
    * same-timestamp ties deterministically (an event id); runs sort
    * within a key's partition, bounded by that key's event count.
    */
  def scd2History(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, tsTieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col("key"))
    val ordered = byKey.orderBy(col("ts"), col("tie"))
    val runs = events
      .select(col(keyCol).as("key"), col(tsCol).as("ts"),
        col(valueCol).as("value"), col(tsTieCol).as("tie"))
      // null-SAFE change detection (<=>): `lag.isNull || lag =!= value`
      // merged a value→NULL transition into the prior run (the =!= is
      // NULL, so chg fell to 0 and the NULL period vanished) and opened
      // a fresh run on EVERY consecutive NULL (lag.isNull fired each
      // time). With negated <=>, a→NULL changes, NULL→NULL collapses,
      // and the first event of a key still opens its run (missing lag is
      // distinct from any non-null value; an all-NULL first run just
      // starts at run 0 instead of 1 — run ids are internal to the
      // groupBy). cdcDiff below always used <=>; this aligns the family.
      .withColumn("chg",
        when(!(lag(col("value"), 1).over(ordered) <=> col("value")), 1L)
          .otherwise(0L))
      .withColumn("run", sum(col("chg")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = runs
      .groupBy(col("key"), col("run"))
      // all events in a run carry the SAME value (that is what a run is),
      // so min() is just the deterministic way to read it back
      .agg(min(col("value")).as("value"), min(col("ts")).as("valid_from"))
    intervals
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(byKey.orderBy(col("run"))))
      .select(col("key"), col("value"), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
