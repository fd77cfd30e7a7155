package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input contract: every pipeline operator over the
  * documents/embeddings/events tables must handle an EMPTY corpus cleanly —
  * an empty result (schema intact), or the operator's documented
  * IllegalArgumentException — never an NPE / NoSuchElement / NULL-read
  * crash. This is the batch twin of StreamingSpec's empty-source test (the
  * probe that caught the complete-mode NULL-max crash). Queries that also
  * read the TPC-H star (profile/skew/quantiles/HLL over lineitem etc.) are
  * out of scope here — they fail fast on the missing table path.
  */
class EmptyProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every documents/embeddings/events operator survives an empty corpus") {
    val sf = TestSpark.tmpDir("emptysf")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    Seq.empty[(Long, Array[Float], Long)]
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$sf/embeddings.parquet")
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$sf/events.parquet")

    // BPE training REQUIREs a non-degenerate corpus, by documented contract
    val requiresNonEmpty = Set("x_bpe_merges", "x_bpe_encode")
    val emptyOk = Seq(
      "x_dedup_exact", "x_dedup_minhash_lsh", "x_dedup_jaccard",
      "x_dedup_containment", "x_dedup_containment_idx",
      "x_dedup_edit_verify", "x_dedup_stats",
      "x_shard_manifest",
      "x_dedup_incremental", "x_filter_length_band", "x_cluster_balance",
      "x_dedup_simhash_pairs", "x_dedup_clusters", "x_dedup_semantic",
      "x_dedup_keep_best", "x_decontaminate", "x_bloom_decontaminate",
      "x_multimodal_phash", "x_ann_topk", "x_ann_ivf",
      "x_ann_ivf_trained", "x_ann_kmeans", "x_ann_lsh", "x_ann_recall",
      "x_ann_pq", "x_ann_ivfpq",
      "x_bpe_pair_stats", "x_lang_id", "x_lang_id_ngram", "x_quality",
      "x_token_count", "x_repetition_ratio",
      "x_top_tokens", "x_tfidf_top_terms", "x_chunk_docs", "x_pack_greedy",
      "x_split_assign", "x_split_leakage_safe", "x_mix_weighted",
      "x_mix_epochs", "x_redact_pii",
      "x_sample_stratified", "x_cap_per_source", "x_fingerprint",
      "x_normalize_text", "x_oov_rate", "x_rarity_score", "x_bigram_lm",
      "x_filter_funnel", "x_corpus_diff", "x_corpus_drift",
      "x_cross_source_leakage",
      "x_filter_fluency_band", "x_pipeline_e2e",
      "x_multimodal_meta", "x_inverted_index", "x_search_tfidf",
      // events-based operators
      "x_incr_agg", "x_funnel_steps", "x_retention_cohort", "x_cdc_apply",
      "x_scd2_history", "x_negative_sample",
      "x_asof_join", "x_asof_forward", "x_range_join")

    val broken = emptyOk.flatMap { n =>
      try { SparkEntry.queries(n)(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$n -> ${e.getClass.getSimpleName}") }
    }
    assert(broken.isEmpty,
      s"operators crashed on an empty corpus: ${broken.mkString(", ")}")

    requiresNonEmpty.foreach { n =>
      val ex = intercept[IllegalArgumentException] {
        SparkEntry.queries(n)(spark, sf).count()
      }
      assert(ex.getMessage.contains("no adjacent token pairs"),
        s"$n must fail with the documented message, got: ${ex.getMessage}")
    }

    // ...and the DISTRIBUTED BPE path (size gate forced off) must fail with
    // the SAME documented exception, not a bare NoSuchElementException from
    // an empty top-pair aggregation
    spark.conf.set("graft.bpe.driverMaxBytes", "0")
    try requiresNonEmpty.foreach { n =>
      val ex = intercept[IllegalArgumentException] {
        SparkEntry.queries(n)(spark, sf).count()
      }
      assert(ex.getMessage.contains("no adjacent token pairs"),
        s"$n (distributed path) must fail with the documented message, " +
          s"got: ${ex.getMessage}")
    } finally spark.conf.unset("graft.bpe.driverMaxBytes")

    // a malformed size-gate conf names the key instead of a raw
    // NumberFormatException at query-build time
    spark.conf.set("graft.bpe.driverMaxBytes", "64MB")
    try {
      val ex = intercept[IllegalArgumentException] {
        SparkEntry.queries("x_bpe_merges")(spark, sf).count()
      }
      assert(ex.getMessage.contains("graft.bpe.driverMaxBytes"),
        s"error must name the conf key, got: ${ex.getMessage}")
    } finally spark.conf.unset("graft.bpe.driverMaxBytes")
  }
}
