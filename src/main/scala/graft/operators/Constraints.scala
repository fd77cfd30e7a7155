package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the "did the sync land
  * consistent data" check a warehouse pipeline runs after every load.
  * The reference trusts the source engine's constraints and verifies only
  * row counts (`tests/test_postgres.py:112-118` count parity); at pipeline
  * scale the warehouse copy drifts independently (partial loads, schema
  * coercions, upstream bugs), so constraints must be re-checkable against
  * the landed data itself. One report row per (table, constraint):
  * rows checked, violations, pass verdict.
  *
  * Scale: every ROW-LOCAL constraint on a table (not-null, check
  * predicate, value set) folds into ONE aggregation over ONE scan — the
  * violation counters are conditional sums riding the same pass, unpivoted
  * by `stack` (one plan subtree, not one scan per constraint). `unique`
  * is a count + count-distinct in one aggregate; `fk` is a broadcast of
  * the DISTINCT parent-key domain into a left-outer conditional count —
  * the child table never shuffles. The report is constraint-count-sized.
  */
object Constraints {

  /** The corpus's shared row-local document rules, defined ONCE and
    * referenced by the batch audit (`x_constraint_audit`), the streaming
    * ingest gate ([[graft.streaming.StreamingSync.streamConstraintScreen]]),
    * and both of their oracle SQL strings (interpolated, not retyped) — so
    * the three copies cannot silently drift. `MinLength` is GATE-only: the
    * batch audit reports lang/null/unique violations for triage, while the
    * gate additionally refuses under-length rows at the door. */
  object DocRules {
    val AllowedLangs: Seq[String] = Seq("en", "de", "fr", "es")
    /** Gate-only minimum `length(text)` for admission. */
    val MinLength: Int = 10
    /** `lang ∈ AllowedLangs`, NULL → false (an unverifiable row is not a
      * verified row — same convention as [[Check]]). */
    def langInSet: Column =
      coalesce(col("lang").isin(AllowedLangs: _*), lit(false))
    /** `length(text) >= MinLength`. NULL contract: callers conjoin
      * `text.isNotNull` first, so `length(text)` is never NULL here. */
    def minLengthOk: Column = length(col("text")) >= MinLength
    /** `'en','de','fr','es'` — the SQL-literal list for oracle IN-sets. */
    def langsSql: String = AllowedLangs.map("'" + _ + "'").mkString(",")
  }

  sealed trait Constraint

  /** Violated when the column is NULL. */
  final case class NotNull(column: String) extends Constraint

  /** Violated when the predicate is not satisfied; a NULL predicate
    * result (e.g. a comparison against NULL) counts as a violation —
    * an unverifiable row is not a verified row. */
  final case class Check(name: String, predicate: Column) extends Constraint

  /** Violated when the column's value is not in the set (NULL included —
    * pair with [[NotNull]] if NULL should be reported separately). */
  final case class InSet(column: String, values: Seq[String])
    extends Constraint

  /** Violated by every row in excess of one per key tuple: violations =
    * rows − distinct non-NULL key tuples (a NULL key therefore counts
    * against uniqueness on both engines' count-distinct semantics). */
  final case class Unique(columns: Seq[String]) extends Constraint

  /** Violated when a non-NULL child key has no match in the parent's key
    * domain (SQL FK semantics: NULL child keys are exempt). */
  final case class ForeignKey(column: String, parentName: String,
                              parent: DataFrame, parentColumn: String)
    extends Constraint

  /** Stable report label for each constraint — mirrored verbatim by any
    * oracle, so keep these strings boring and deterministic. */
  def label(c: Constraint): String = c match {
    case NotNull(col)            => s"not_null($col)"
    case Check(name, _)          => s"check($name)"
    case InSet(col, _)           => s"in_set($col)"
    case Unique(cols)            => s"unique(${cols.mkString(",")})"
    case ForeignKey(c, pn, _, p) => s"fk($c -> $pn.$p)"
  }

  /** Audit every (table, constraints) pair into one report:
    * (table_name, constraint_name, n_rows, n_violations, ok),
    * ordered by table then constraint. */
  def audit(tables: Seq[(String, DataFrame, Seq[Constraint])]): DataFrame = {
    val frames = tables.flatMap { case (tname, df, cs) =>
      val rowLocal: Seq[(String, Column)] = cs.collect {
        case c @ NotNull(column) => (label(c), col(column).isNull)
        case c @ Check(_, pred)  => (label(c), !coalesce(pred, lit(false)))
        case c @ InSet(column, vs) =>
          (label(c), !coalesce(col(column).isin(vs: _*), lit(false)))
      }
      val localFrame =
        if (rowLocal.isEmpty) Seq.empty[DataFrame]
        else {
          val aggs = count(lit(1)).as("n_rows") +:
            rowLocal.zipWithIndex.map { case ((_, viol), i) =>
              // coalesce: an EMPTY table has zero violations, not NULL
              coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L))
                .as(s"v_$i")
            }
          val one = df.agg(aggs.head, aggs.tail: _*)
          // names interpolate into SQL string literals — double any
          // embedded quote or a label like "o'brien rule" parse-fails
          // the whole audit (and is an injection surface)
          val stackArgs = rowLocal.zipWithIndex
            .map { case ((name, _), i) =>
              s"'${name.replace("'", "''")}', v_$i" }.mkString(", ")
          Seq(one.select(lit(tname).as("table_name"), col("n_rows"),
              expr(s"stack(${rowLocal.size}, $stackArgs)")
                .as(Seq("constraint_name", "n_violations")))
            .select(col("table_name"), col("constraint_name"),
              col("n_rows"), col("n_violations")))
        }
      val otherFrames = cs.collect {
        case c @ Unique(cols) =>
          df.agg(count(lit(1)).as("n_rows"),
              countDistinct(col(cols.head), cols.tail.map(col): _*)
                .as("n_distinct"))
            .select(lit(tname).as("table_name"),
              lit(label(c)).as("constraint_name"), col("n_rows"),
              (col("n_rows") - col("n_distinct")).as("n_violations"))
        case c @ ForeignKey(column, _, parent, parentColumn) =>
          val dom = parent.select(col(parentColumn).as("__fk"))
            .where(col("__fk").isNotNull).distinct()
          df.join(broadcast(dom), col(column) === col("__fk"), "left_outer")
            .agg(count(lit(1)).as("n_rows"),
              coalesce(sum(when(col("__fk").isNull && col(column).isNotNull,
                1L).otherwise(0L)), lit(0L)).as("n_violations"))
            .select(lit(tname).as("table_name"),
              lit(label(c)).as("constraint_name"), col("n_rows"),
              col("n_violations"))
      }
      localFrame ++ otherFrames
    }
    frames.reduce(_ unionByName _)
      .withColumn("ok", col("n_violations") === 0L)
      .orderBy("table_name", "constraint_name")
  }
}
