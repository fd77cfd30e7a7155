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
}
