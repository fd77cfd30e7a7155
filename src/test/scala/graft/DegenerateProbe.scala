package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input contracts beyond the empty corpus (EmptyProbeSpec):
  * a SINGLE-row corpus (windows over one row, centroids of one vector,
  * self-join candidates with no partner) and a NULL-HEAVY corpus (null
  * text/lang/source, null embedding/label, null everything-but-key
  * events). Every operator must return a clean result or fail with a
  * documented IllegalArgumentException — never an NPE / NULL-read /
  * match error. Probing this family is what caught the complete-mode
  * changelog NULL-max crash.
  */
class DegenerateProbe extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val names = Seq(
    "x_dedup_exact", "x_dedup_minhash_lsh", "x_dedup_jaccard",
    "x_dedup_containment", "x_dedup_containment_idx",
    "x_dedup_edit_verify", "x_dedup_stats",
    "x_shard_manifest",
    "x_dedup_incremental", "x_filter_length_band", "x_cluster_balance",
    "x_dedup_simhash_pairs", "x_dedup_clusters", "x_dedup_semantic",
    "x_dedup_keep_best", "x_decontaminate", "x_ann_topk", "x_ann_ivf",
    "x_ann_ivf_trained", "x_ann_kmeans", "x_ann_lsh", "x_ann_recall",
    "x_ann_pq", "x_ann_ivfpq",
    "x_bpe_merges", "x_bpe_encode", "x_bpe_pair_stats", "x_lang_id",
    "x_lang_id_ngram", "x_repetition_ratio",
    "x_quality", "x_token_count", "x_top_tokens", "x_tfidf_top_terms",
    "x_chunk_docs", "x_pack_greedy", "x_split_assign",
    "x_split_leakage_safe", "x_mix_weighted", "x_mix_epochs",
    "x_redact_pii", "x_sample_stratified", "x_cap_per_source",
    "x_fingerprint", "x_normalize_text", "x_oov_rate", "x_rarity_score",
    "x_bigram_lm", "x_filter_funnel", "x_corpus_diff", "x_corpus_drift",
    "x_cross_source_leakage", "x_filter_fluency_band",
    "x_pipeline_e2e", "x_multimodal_meta", "x_multimodal_phash",
    "x_bloom_decontaminate", "x_inverted_index",
    "x_search_tfidf",
    "x_incr_agg", "x_funnel_steps", "x_retention_cohort", "x_cdc_apply",
    "x_scd2_history", "x_negative_sample",
    "x_asof_join", "x_asof_forward", "x_range_join")

  /** Clean outcomes: a computed count, or a documented require. Anything
    * else (NPE, NULL-read, match error, analysis failure) is a defect. */
  private def crashes(sf: String): Seq[String] =
    names.flatMap { n =>
      try { SparkEntry.queries(n)(spark, sf).count(); None }
      catch {
        case _: IllegalArgumentException => None
        case e: Throwable => Some(s"$n -> ${e.getClass.getSimpleName}")
      }
    }

  test("single-row corpus: every operator returns or requires cleanly") {
    val sf = TestSpark.tmpDir("onerow")
    Seq((1L, "hello world two tokens", "en", "src0", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    Seq((1L, Array.fill(64)(0.5f), 3L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$sf/embeddings.parquet")
    Seq((10L, java.sql.Timestamp.valueOf("2000-01-01 12:00:00"), 1L,
      "purchase", 1.5, """{"k":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$sf/events.parquet")
    val broken = crashes(sf)
    assert(broken.isEmpty, s"single-row crashes: ${broken.mkString(", ")}")
  }

  test("null-heavy corpus: every operator returns or requires cleanly") {
    val sf = TestSpark.tmpDir("nullrows")
    Seq((Option(1L), Option("a b"), Option.empty[String], Option.empty[String], Option(3L)),
      (Option(2L), Option.empty[String], Option("en"), Option("s"), Option.empty[Long]))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    Seq((Option(1L), Option(Array.fill(64)(0.5f)), Option(3L)),
      (Option(2L), Option.empty[Array[Float]], Option.empty[Long]))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$sf/embeddings.parquet")
    Seq((Option(10L), Option(java.sql.Timestamp.valueOf("2000-01-01 12:00:00")),
        Option(1L), Option("purchase"), Option(1.5), Option("""{"k":1}""")),
      (Option(11L), Option.empty[java.sql.Timestamp], Option.empty[Long],
        Option.empty[String], Option.empty[Double], Option.empty[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$sf/events.parquet")
    val broken = crashes(sf)
    assert(broken.isEmpty, s"null-heavy crashes: ${broken.mkString(", ")}")
  }
}
