package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staged curation-funnel attrition report — the observability spine of a
  * web-corpus pipeline. Every production curation run (reference behavior:
  * the pipeline stages of CCNet/RefinedWeb-style curation) is judged by one
  * table: how many documents entered, and how many each successive filter
  * removed. Silent attrition — a language filter that eats 60% of a batch,
  * a dedup stage that suddenly drops nothing — is the classic way a corpus
  * regression ships, so the funnel is a first-class queryable operator, not
  * a log line.
  *
  * Stages, cumulative and in canonical order: language keep → token-length
  * band → shingle-repetition cap → PII (email) rejection → exact dedup
  * (first doc_id wins among surviving copies of a fingerprint). Thresholds
  * mirror `x_quality_flags` so the two views of quality never disagree.
  *
  * Scale shape (the 100 TB contract): all five per-doc flags come from ONE
  * projection pass (no per-stage scans — five scans of 100 TB is the naive
  * shape this operator exists to avoid). The only corpus-wide shuffle is
  * the dedup window, hash-partitioned by content fingerprint exactly like
  * `w1_rownum_dedup`; survival ordering inside the window (`s4 DESC,
  * doc_id`) makes "first surviving copy" computable WITHOUT first
  * materializing the survivor subset. The report itself is a single
  * map-side-partial aggregate down to one row, unpivoted to six.
  *
  * Three-valued logic is deliberately banished: every flag is
  * `coalesce(..., false)`, so a null text/lang row fails the stage rather
  * than poisoning the boolean chain (`true AND null` stays null through
  * every downstream stage) and the engines' null-ordering defaults never
  * get a vote in the dedup window.
  */
object CurationFunnel {

  /** Email-bearing docs are rejected at the PII stage; pattern shared with
    * the redaction operator via the caller.
    *
    * r15 restructure, both legs result-identical (oracle unchanged,
    * hash-verified):
    *  - the repetition flag needs only the shingle COUNTS, never the
    *    shingle strings: total = `1` / `n_tokens − 2` (shinglesFromTokens'
    *    short-doc rule, pure arithmetic) and distinct =
    *    `size(ShingleKeys60(toks))` (one native pass; distinctness by
    *    shingle string, exactly `size(array_distinct(shl))`). The old
    *    interpreted transform materialized every shingle string per doc
    *    just to count them.
    *  - the exact-dedup count never needed the per-fp row_number window
    *    (a full-corpus exchange + per-group sort): the window's rank-1
    *    row is an s4 row whenever the group HAS one (s4 sorts desc), so
    *    c5 = "fp groups containing ≥1 surviving doc" =
    *    `count(DISTINCT when(s4, fp))` — a partial-aggregating distinct
    *    over survivors' fingerprints only. The one corpus-wide shuffle
    *    now carries just the distinct fps of surviving docs.
    */
  def funnelReport(docs: DataFrame, keepLang: String, emailRe: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val flagged = docs
      .select(col("doc_id"), col("lang"), col("text"), toks.as("toks"))
      .select(col("doc_id"), col("lang"), col("text"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(graft.functions.NativeExpressions.shingleKeys60(col("toks"), 3))
          .cast("long").as("n_distinct_sh"))
      .select(col("doc_id"),
        coalesce(col("lang") === keepLang, lit(false)).as("f_lang"),
        coalesce(col("n_tokens").between(20, 90), lit(false)).as("f_len"),
        coalesce((lit(1.0) - col("n_distinct_sh").cast("double") /
          when(col("n_tokens") < 3, lit(1L)).otherwise(col("n_tokens") - 2)
            .cast("double")) <= 0.05, lit(false)).as("f_rep"),
        coalesce(size(regexp_extract_all(col("text"), lit(emailRe), lit(0))) === 0,
          lit(false)).as("f_pii"),
        md5(col("text")).as("fp"))
      .withColumn("s1", col("f_lang"))
      .withColumn("s2", col("s1") && col("f_len"))
      .withColumn("s3", col("s2") && col("f_rep"))
      .withColumn("s4", col("s3") && col("f_pii"))
    flagged
      .agg(
        count(lit(1)).as("c0"),
        coalesce(sum(col("s1").cast("long")), lit(0L)).as("c1"),
        coalesce(sum(col("s2").cast("long")), lit(0L)).as("c2"),
        coalesce(sum(col("s3").cast("long")), lit(0L)).as("c3"),
        coalesce(sum(col("s4").cast("long")), lit(0L)).as("c4"),
        countDistinct(when(col("s4"), col("fp"))).as("c5"))
      .select(expr(
        """stack(6,
          |  0, 'ingest',      c0, cast(0 as bigint),
          |  1, 'lang',        c1, c0 - c1,
          |  2, 'length_band', c2, c1 - c2,
          |  3, 'repetition',  c3, c2 - c3,
          |  4, 'pii',         c4, c3 - c4,
          |  5, 'exact_dedup', c5, c4 - c5)
          |  as (stage_idx, stage, n_out, n_dropped)""".stripMargin))
      .orderBy("stage_idx")
  }
}
