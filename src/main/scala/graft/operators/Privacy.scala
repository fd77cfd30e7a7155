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
}
