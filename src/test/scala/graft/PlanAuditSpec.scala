package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: no registered query may plan a Cartesian
  * product or nested-loop join — the two shapes that die at 100 TB. The
  * single exception is the documented brute-force ANN baseline
  * (`x_ann_topk`), whose broadcast cross join against a tiny query set is
  * the point of the operator (the scale paths are `x_ann_ivf`/`x_ann_lsh`).
  *
  * Queries that execute side effects at construction time (streaming runs,
  * CSV writes) are exercised by their own suites and skipped here.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val sideEffecting =
    Set("stream_window_agg", "stream_user_rollup", "stream_dedup",
      "stream_range_join", "stream_enrich", "stream_sessionize",
      "stream_sessionize_wm", "stream_rollup_tws", "stream_cdc_apply",
      "stream_corpus_hist", "stream_quality_gate", "stream_decontaminate",
      "stream_event_spikes", "stream_attribution", "stream_cell_occupancy",
      "stream_url_dedup", "stream_domain_cap", "stream_quality_score",
      "stream_neardup", "stream_scd2", "stream_forget",
      "stream_constraint_gate",
      "s2_csv_roundtrip", "s4_orc_roundtrip", "s5_partitioned_prune",
      "x_time_travel", "x_snapshot_cdc")
  // x_ann_topk: documented brute-force baseline; x_ann_kmeans_assign /
  // x_ann_kmeans / x_ann_ivf / x_ann_ivf_multiprobe: k tiny centroid rows
  // broadcast against every vector (assign/probe-selection step) —
  // deliberate broadcast products over a handful of centroids, never
  // corpus×corpus (the probe→corpus scoring join itself is an equi-join).
  // x_vec_sql_native: 5×20-row SQL-surface demo of the injected function +
  // rewrite rule; its range-predicate join is the demo's point, not a
  // corpus-scale shape (the scale paths are the x_ann_* queries).
  // The VALUE is the maximum rows the non-equi join's smaller side may
  // hold — the "bounded relation" claim each whitelist entry rests on,
  // asserted by the bounded-build-side test below (so a future genuine
  // cross join inside these queries fails the audit instead of hiding
  // behind the name).
  private val allowCross: Map[String, Long] = Map(
    "x_ann_topk" -> 16L,          // 10 probe vectors
    "x_ann_kmeans_assign" -> 16L, // 16 centroids
    "x_cluster_balance" -> 16L,   // same assign step, 16 centroids
    "x_sample_diverse" -> 16L,    // same assign step, 16 centroids
    "x_cluster_label" -> 16L,     // same assign step, 16 centroids
    "x_cluster_medoid" -> 16L,    // same assign step, 16 centroids
    "x_ann_filtered" -> 16L,      // 10 probe vectors vs the filtered corpus
    "x_ann_kmeans" -> 16L,
    "x_ann_ivf" -> 16L,
    "x_ann_ivf_multiprobe" -> 16L,
    "x_ann_ivf_trained" -> 16L,
    "x_ann_recall" -> 16L,        // 16 centroids; truth side probes = 10
    "x_ann_pq" -> 16L,            // two ≤4-row codebooks
    "x_ann_ivfpq" -> 16L,         // 16 coarse centroids + two ≤4-row codebooks
    "x_vec_sql_native" -> 100L,   // 5×20-row demo relations
    "x_search_tfidf" -> 1L,       // the 1-row corpus-count broadcast
    "x_search_bm25" -> 1L,        // the 1-row corpus-stats broadcast
    "x_importance_weights" -> 1L, // the 1-row token-totals broadcast
    "x_pmi_bigrams" -> 1L,        // the 1-row corpus-total broadcast
    "x_quality_classifier" -> 1L, // the 1-row seed-mass-baseline broadcast
    "x_hybrid_search" -> 1L,      // 1-row probe + 1-row corpus-stats broadcasts
    "x_join_skew_report" -> 1L)   // the 1-row total-contribution broadcast

  test("no query plans a cartesian product or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if sideEffecting(name) || allowCross.contains(name) => None
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) Some(name)
        else None
    }
    assert(offenders.isEmpty,
      s"queries with non-scalable join shapes: ${offenders.mkString(", ")}")
  }

  test("whitelisted cross joins broadcast only a bounded relation") {
    // Each allowCross entry claims its non-equi join is a handful of
    // centroid/demo/probe rows against the corpus. Assert it: every
    // logical Join with no equi predicate linking the two sides must have
    // a smaller side within the declared row bound. A future genuine
    // corpus×corpus cross join in these queries now fails the audit.
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.graft.PlanBridge

    def hasEquiKey(j: Join): Boolean = j.condition.exists { c =>
      def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjuncts(l) ++ conjuncts(r)
        case other => Seq(other)
      }
      conjuncts(c).exists {
        case EqualTo(l, r) =>
          (l.references.subsetOf(j.left.outputSet) &&
            r.references.subsetOf(j.right.outputSet)) ||
          (r.references.subsetOf(j.left.outputSet) &&
            l.references.subsetOf(j.right.outputSet))
        case _ => false
      }
    }

    allowCross.toSeq.sortBy(_._1).foreach { case (name, bound) =>
      val qe = SparkEntry.queries(name)(spark, sf).queryExecution
      // optimized plan first (CTEs inlined — a subtree cut from the
      // analyzed plan of a WITH-query holds orphaned CTERelationRefs and
      // cannot be re-counted); fall back to the analyzed plan when cache
      // substitution folded the join into an InMemoryRelation leaf
      // (x_ann_kmeans persists each Lloyd round)
      def crossesIn(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
        p.collect { case j: Join if !hasEquiKey(j) => j }
      val optCrosses = crossesIn(qe.optimizedPlan)
      val crosses =
        if (optCrosses.nonEmpty) optCrosses else crossesIn(qe.analyzed)
      assert(crosses.nonEmpty,
        s"$name is whitelisted but plans no non-equi join — remove it " +
          "from allowCross (stale exemptions hide future regressions)")
      crosses.foreach { j =>
        val smaller = math.min(
          PlanBridge.ofRows(spark, j.left).count(),
          PlanBridge.ofRows(spark, j.right).count())
        assert(smaller <= bound,
          s"$name: non-equi join's smaller side has $smaller rows — " +
            s"exceeds the declared bounded-relation cap of $bound")
      }
    }
  }

  test("rank-limit shapes keep Spark's partial WindowGroupLimit pushdown") {
    // These queries filter row_number() ≤ k directly above the window and
    // rely on Spark 4's WindowGroupLimit partial mode for skew safety at
    // 100 TB: each input partition reduces to its local top-k BEFORE the
    // shuffle, so a pathologically hot key (one crawl domain, one user)
    // ships k rows per partition instead of its full volume. A Spark
    // upgrade or query edit that silently loses the pushdown (e.g. a
    // projection wedged between filter and window) fails here.
    val rankLimited = Seq(
      "j1_merge_upsert", "j1b_merge_composite", "sync_upsert_e2e",
      "w1_rownum_dedup", "x_ann_ivf", "x_ann_ivf_multiprobe",
      "x_ann_ivf_trained", "x_ann_kmeans", "x_ann_kmeans_assign",
      "x_ann_lsh", "x_ann_recall", "x_ann_topk", "x_asof_forward",
      "x_asof_join", "x_cap_per_source",
      // x_dedup_containment_idx left r14: its bottom-k probe is now a
      // per-row array_sort+slice (no window at all — better than a
      // pushed-down one)
      "x_inverted_index",
      "x_pipeline_e2e", "x_sample_stratified", "x_tfidf_top_terms")
    val missing = rankLimited.filterNot { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      "WindowGroupLimit[^\\n]*Partial".r.findFirstIn(plan).isDefined
    }
    assert(missing.isEmpty,
      s"queries that lost the partial WindowGroupLimit pushdown: " +
        missing.mkString(", "))
  }

  test("containment-index probe join shuffles — never broadcasts the " +
    "posting volume") {
    // r14: Catalyst's size estimate for the posting side — a Generate
    // over the compact cached key arrays — is low enough that without
    // the SHUFFLE_HASH hint it BROADCAST the full exploded posting table
    // (measured at sf1: every task builds a 10M-row hash relation →
    // executor OOM). Both join inputs are corpus-sized, so the only
    // 100 TB-safe shape is a shuffled join with the ≤k-rows-per-doc
    // probe as build side.
    val plan = SparkEntry.queries("x_dedup_containment_idx")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"probe→postings join must stay a shuffled hash join:\n$plan")
    // r15 hot-path pins: the khl cache build and the run counter are the
    // native one-loop expressions (a regression to the interpreted
    // composed chains tripled the solo warm cost), and the posting stream
    // is bloom-gated BEFORE its groupBy exchange (the never-probed-key
    // tail dies at the scan)
    assert(plan.contains("shingle_keys_60"),
      s"khl build must use the native ShingleKeys60 expression:\n$plan")
    assert(plan.contains("containment_runs"),
      s"run counting must use the native ContainmentRuns expression:\n$plan")
    assert(plan.contains("might_contain"),
      s"posting stream must be bloom-gated before its exchange:\n$plan")
    graft.operators.Dedup.unpersistAll()
  }

  test("per-row operators stay shuffle-free: zero Exchange in the plan") {
    // These queries are pure scan → narrow map (+ optional filter/union):
    // per-row text features, multimodal decode, chunking, split
    // assignment, scalar functions, watermark-filtered scans. At 100 TB a
    // single accidental Exchange in one of these turns a streaming-friendly
    // map into a corpus-wide shuffle — the regression this pins out.
    // (Deliberately absent: size-gated operators like x_bpe_merges /
    // x_dedup_clusters, whose sf0.001 plans are driver fast paths, and
    // aggregations/joins whose shuffles are the algorithm.)
    val narrowByDesign = Seq(
      "s1_scan_project", "p2_projection", "p3_watermark_pk",
      "p4_watermark_lm", "p7_like", "u1_union_all",
      "f1_best_effort_ts", "f8_json_extract", "f9_null_safe_eq",
      "f10_from_json", "f11_datetime", "f12_string_funcs", "f13_math_funcs",
      "x_lang_id", "x_lang_id_ngram", "x_quality", "x_quality_flags",
      "x_token_count",
      "x_repetition", "x_repetition_ratio", "x_fingerprint",
      "x_normalize_text", "x_redact_pii", "x_filter_blocklist",
      "x_compressibility", "x_filter_gopher", "x_chunk_docs", "x_split_assign",
      "x_extract_html", "x_sft_format", "x_normalize_unicode",
      "x_mixed_lang", "x_watermark_detect", "x_fim_transform",
      "x_needle_insert",
      "x_mix_weighted", "x_multimodal_meta", "x_multimodal_decode",
      "x_multimodal_frames", "x_multimodal_resize",
      "x_embed_rp_reduce", "x_embed_int8")
    val shuffling = narrowByDesign.filter { name =>
      SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString.contains("Exchange")
    }
    assert(shuffling.isEmpty,
      s"per-row operators gained a shuffle: ${shuffling.mkString(", ")}")
  }

  test("flagship aggregations stay within their shuffle budget") {
    // Ceilings = the current known-good plans (probed at sf0.001): one
    // hash-partition exchange for the single-groupBy/window family; +1
    // range exchange where the query ends in ORDER BY; a few more for the
    // genuinely multi-stage pipelines. A regression that doubles a
    // shuffle (lost partial aggregation, a join that stopped
    // broadcasting and re-partitioned both sides, a projection that
    // broke window/groupBy key reuse) fails here before it costs hours
    // at 100 TB.
    val budget = Map(
      "x_dedup_exact" -> 1, "w1_rownum_dedup" -> 1, "x_cap_per_source" -> 1,
      "x_sample_stratified" -> 1, "x_top_tokens" -> 1,
      // weighted sample: the count and rank windows share ONE source
      // exchange; rebalance: HRW argmax is per-row, so only the 2-row
      // scheme agg + its ORDER BY shuffle; attribution: user_id window +
      // channel agg + ORDER BY; preference pairs: tok agg + doc agg +
      // source window (the source groupBy and pairing reuse the window's
      // partitioning — a 4th exchange means the single-pass shape broke)
      "x_sample_weighted" -> 1, "x_shard_rebalance" -> 2,
      "x_attribution_last_touch" -> 3, "x_preference_pairs" -> 3,
      // confusion: per-row predictions + ONE (lang, pred, pred) agg + ORDER BY
      "x_langid_confusion" -> 2,
      // masked packing: the bin re-agg MUST ride the pack window's
      // (lang, shard) exchange — a 2nd exchange means that reuse broke
      "x_pack_masked" -> 1,
      // within-doc dedup: the (doc, passage-hash) window + the per-doc
      // re-agg (doc_id is a SUBSET of the window keys, so it genuinely
      // re-shuffles — unlike pack_masked's superset grouping)
      "x_dedup_within_doc" -> 2,
      // line dedup: the corpus-wide line-hash frequency window + the
      // per-doc reassembly agg — no joins, 32-byte shuffle keys
      "x_dedup_lines" -> 2,
      // url dedup: ONE hash exchange on the canonical string (both the
      // n_copies count and keep-first verdict ride the same window)
      "x_dedup_url" -> 1,
      // domain cap: canonicalization + host extraction are per-row; ONE
      // hash exchange on the host string for the rank window
      "x_domain_cap" -> 1,
      // phash dedup: the hash is a narrow mapPartitions; ONE exchange on
      // the 16-char hash (both window verdicts ride it)
      "x_multimodal_phash" -> 1,
      // k-anonymity: ONE hash agg on the QI tuple; l-diversity adds the
      // (QI, sensitive) pre-distinct exchange Spark plans for an exact
      // countDistinct alongside another agg — 2 total, both class-keyed
      "x_k_anonymity" -> 1, "x_l_diversity" -> 2,
      // t-closeness: (QI, sensitive) agg + the QI window the final agg
      // reuses + the sensitive-domain agg + its single-partition totals
      // window + its BroadcastExchange — every one class/domain-sized,
      // the corpus never shuffles raw rows
      "x_t_closeness" -> 5,
      // DP release: ONE group-key agg; the noise table is a literal
      "x_dp_release" -> 1,
      // interval-overlap join: the two (key, bucket) side exchanges of
      // the equi-join (AQE may collapse the small side to a broadcast);
      // a 3rd exchange means a dedup shuffle crept in — the emit-once
      // bucket rule must stay a per-row predicate
      "x_interval_join" -> 2,
      // bucketed co-located join: ZERO exchanges below the
      // SortMergeJoin (both scans are Bucketed: true) — the only
      // shuffle is the final segment rollup
      "j7_bucket_join" -> 1,
      // constraint audit, 8 constraints over 4 tables: per-table 1-row
      // global aggs (row-local constraints share ONE scan each), the
      // two unique count-distincts' partial+final pairs, the two fk
      // parent-domain distincts + their BroadcastExchanges, and the
      // report's final sort — every exchange moves 1-row, key-domain,
      // or report-sized data; the audited tables never shuffle raw rows
      "x_constraint_audit" -> 12,
      // freshness: one 1-row global agg per monitored table; the global
      // max rides the table-count-sized report without its own exchange
      "x_freshness" -> 3,
      // IVM merge: the two partial-state key exchanges (the merge's
      // re-agg reuses their partitioning through the union)
      "x_ivm_agg" -> 2,
      // join-skew report: the two side-count partial+final agg pairs,
      // the key-domain contribution join's exchanges, the 1-row total
      // broadcast, and TakeOrdered — key-domain-sized throughout
      "x_join_skew_report" -> 8,
      "q1_pricing_summary" -> 2, "q18_large_orders" -> 2,
      // q21 (r14 shape): ONE lineitem-sized exchange — the pinned-SHJ
      // left join's hash(l_orderkey), which BOTH stacked aggregations
      // reuse (their keys ⊇/= the join key) — plus the orders-side
      // hash, the supplier broadcast, and the supplier-count-sized
      // report agg; zero Sorts (TakeOrdered handles the top-25). A 5th
      // exchange means an aggregation stopped riding the join's
      // partitioning and lineitem shuffles twice again
      "q21_late_suppliers" -> 4,
      // q2 (r14 shape): the pair stream is pruned by the part join
      // (broadcast here, shuffle at 100 TB) BEFORE its map-side-combined
      // distinct exchange; then the l_suppkey/s_suppkey join pair, the
      // p_partkey window re-shuffle of the ~2% candidates, and the two
      // bounded nation/region broadcasts. An 8th exchange means the
      // distinct moved back in front of the part filter (full pair
      // volume) or the grouped-MIN self-join shape returned
      "q2_min_cost_supplier" -> 7,
      "x_oov_rate" -> 3, "j1_merge_upsert" -> 3, "x_incr_agg" -> 3,
      "x_decontaminate" -> 4,
      // SCD2: lag + run-sum + per-run collapse + valid_to carry ALL ride
      // one user_id hash exchange (group keys ⊇ window keys; both lead/
      // lag windows share the key) — a 2nd exchange means the reuse broke
      "x_scd2_history" -> 1,
      // bloom-gated twin: SAME budget — the gate is a Filter literal on
      // the train scan, not a join (the bloom build is a separate bounded
      // driver-scalar job at construction, like the watermark reads)
      "x_bloom_decontaminate" -> 4,
      // manifest: one partial+final hash agg + the ORDER BY range exchange;
      // stats: fingerprint agg + copy-count agg + the ORDER BY
      "x_shard_manifest" -> 2, "x_dedup_stats" -> 3,
      // funnel: fingerprint window + 1-row report agg (flags are one scan);
      // diff: two full-outer join sides + the ORDER BY; bigram-LM: the
      // instance collapse, the c2/c1 model derivation, the two model
      // rejoins, the per-doc agg and ORDER BY — all over tables that
      // shrink to vocab size after the first collapse
      "x_filter_funnel" -> 2, "x_corpus_diff" -> 3, "x_bigram_lm" -> 10,
      // drift: ONE corpus-wide combiner agg on (src,bucket), the
      // histogram-sized window re-shuffle on src (whose partitioning the
      // final collapse reuses — a 4th exchange means that reuse broke),
      // and the ORDER BY
      "x_corpus_drift" -> 3,
      // mix planning: the corpus-wide combiner agg + the single-partition
      // totals window over the sources-sized table (which the ORDER BY
      // then rides for free)
      "x_mix_epochs" -> 2,
      // search: the persisted tf subtree's plan text is re-counted inside
      // both InMemoryTableScan consumers (executed ONCE — same accounting
      // as the fluency band); per execution it is the tf combiner agg, the
      // 3-row df agg + two broadcasts, and the per-doc score agg,
      // top-k via TakeOrdered (no sort exchange)
      "x_search_tfidf" -> 8,
      // leakage: (fp,source) distinct, fp self-join both sides, pair agg, ORDER BY
      "x_cross_source_leakage" -> 5,
      // fluency band: textual count — the persisted LM-score subtree's plan
      // (10 exchanges, executed ONCE) is replicated inside every
      // InMemoryTableScan occurrence; the per-execution increment over
      // x_bigram_lm is just the bounded histogram + band filter
      "x_filter_fluency_band" -> 25,
      // ppl buckets: textual count — the persisted scored-corpus subtree
      // (bigram-LM + lang join; executed ONCE) is replicated inside both
      // InMemoryTableScan consumers (histogram side + final assignment
      // side), same accounting as the fluency band; the per-execution
      // increment is just the bounded (lang, score) histogram, its
      // lang-keyed windows/bounds agg, the 1-row-per-lang broadcast,
      // and the ORDER BY
      "x_ppl_buckets" -> 24,
      // quality classifier: textual count — the persisted per-doc
      // multiplicity subtree (executed ONCE) appears in all three
      // InMemoryTableScan consumers (vocab model, baseline scalar,
      // scoring join); per-execution it is the instance collapse, the
      // vocab agg, the tok-keyed scoring join, the per-doc agg, and the
      // ORDER BY
      "x_quality_classifier" -> 12,
      // temperature mixing: ONE corpus-wide combiner agg on lang + the
      // single-partition totals window over the lang-sized table + the
      // ORDER BY riding it
      "x_mix_temperature" -> 3,
      // robots policy: the sources-sized DISTINCT (its partial+final
      // agg) feeding the broadcast; the corpus side never shuffles
      "x_robots_block" -> 2,
      // substring/posting family (r13 shape): node count is 8, but only
      // TWO exchanges carry posting-order volume — the map-side-combined
      // groupBy(h).count() of the df-cap suspect pass (Dedup.heavyGrams;
      // replacing countDistinct's full-volume (h,doc) exchange bought 2×
      // at sf1) and the ONE groupBy(h) collect that replaced the old
      // posting self-join's two; the rest are the tiny suspect-confirm
      // pair, the (a,b,diff) islands window, and the per-pair aggs.
      // A 9th exchange means one of those reductions regressed.
      "x_dedup_substring" -> 8, "x_dedup_substring_mask" -> 8,
      "x_decontaminate_mask" -> 8,
      // surgery report adds the per-doc cut agg + the source rollup on top
      "x_surgery_report" -> 10,
      // hybrid search: textual count — the persisted BM25 tf subtree is
      // re-counted in its consumers (same accounting as x_search_tfidf)
      // + the 1-row-probe vector leg's rank window + the 20x20
      // full-outer fusion join + the final TakeOrdered
      "x_hybrid_search" -> 20,
      // epoch shuffle: ONE 8-way shard hash exchange; each shard's rank
      // window rides it — a 2nd exchange means a global sort crept in
      "x_shuffle_epoch" -> 1,
      // forget-users audit: per table = the docket distinct (docket-sized),
      // its BroadcastExchange, and the 1-row global agg — 3 x 3; every
      // shuffle moves docket-sized or 1-row data, the corpus tables never
      // shuffle (a 4th per-table exchange = the broadcast anti shape broke)
      "x_forget_users" -> 10)
    val over = budget.toSeq.sortBy(_._1).flatMap { case (name, cap) =>
      // drop caches registered by earlier queries' CONSTRUCTION (e.g. the
      // fluency band persists the LM-score subtree it shares with
      // x_bigram_lm): CacheManager substitution would otherwise splice an
      // InMemoryTableScan — whose stored plan text re-counts the cached
      // subtree's exchanges — into a plan that is cache-free when the
      // query runs alone, making counts depend on suite order
      graft.operators.CacheRegistry.unpersistAll()
      val n = "Exchange".r.findAllIn(SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString).size
      if (n > cap) Some(s"$name: $n exchanges > budget $cap") else None
    }
    assert(over.isEmpty, s"shuffle-budget regressions:\n  ${over.mkString("\n  ")}")
  }

  test("q21 plans zero Sort operators: SHJ + hash aggregates + TakeOrdered") {
    // the r14 q21 rationale: a sort-merge join would sort the full
    // lineitem side that the downstream HASH aggregates never need
    // sorted, and the top-25 must stay a TakeOrdered, not a global sort.
    // A Sort node appearing anywhere = one of those shapes regressed.
    val plan = SparkEntry.queries("q21_late_suppliers")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), s"q21 grew a Sort:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), "top-25 must be TakeOrdered")
    assert(plan.contains("ShuffledHashJoin"), "the late-tag join must stay SHJ")
  }

  test("bloom-gated decontamination: the gate is a scan-side Filter " +
    "(might_contain on the literal sketch), never a join") {
    val plan = SparkEntry.queries("x_bloom_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "the Bloom probe must survive into the physical plan")
    // the probe must sit between its scan and any Exchange: plan dumps
    // are pre-order, so the gate's subtree prints immediately after it —
    // no Exchange line may appear between the probe and the next Scan
    val lines = plan.split("\n").toSeq
    val probeLine = lines.indexWhere(_.contains("might_contain"))
    assert(probeLine >= 0)
    val below = lines.drop(probeLine + 1)
    val scanAt = below.indexWhere(l =>
      l.contains("Scan") || l.contains("LocalTableScan"))
    assert(scanAt >= 0 && !below.take(scanAt).exists(_.contains("Exchange")),
      "the Bloom gate drifted above an Exchange — rows are shuffling " +
        "before the sketch can drop them:\n" +
        below.take(scanAt + 1).mkString("\n"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      "the literal-sketch design must not introduce a join for the filter")
  }

  test("round-9 streaming twins stay within their micro-batch shuffle " +
    "budgets (IncrementalExecution plans via the StreamingBridge)") {
    // The streaming twins run to completion at construction, so the batch
    // budget test cannot see their plans; StreamingSync.lastRunPlan
    // exposes the final micro-batch's EXECUTED plan (state-store
    // operators included). Budgets = current known-good plans at sf0.001:
    // quality gate and attribution are one stateful agg each (ONE hash
    // exchange feeding the state store); decontaminate is the broadcast
    // 8-gram anti-join chain (same 4-exchange budget as its batch twin
    // x_decontaminate — the broadcasts themselves are not Exchanges).
    val budget = Map(
      "stream_quality_gate" -> 1,
      // decontaminate (r16): the probe set is persisted at training time,
      // so the micro-batch plan substitutes an InMemoryTableScan whose
      // printed InMemoryRelation STILL SHOWS the offline build's
      // exchanges (they run once at training, never per batch) — the
      // per-batch exchanges are just the stream side's doc agg; 6 counts
      // the cached subtree's text artifacts, and the substitution itself
      // is asserted below
      "stream_decontaminate" -> 6,
      "stream_attribution" -> 1,
      // URL seen-set: canonicalization is per-row; ONE exchange feeds
      // the dropDuplicates state store
      "stream_url_dedup" -> 1,
      // per-domain crawl budget: host extraction is per-row; ONE exchange
      // groups by host into the flatMapGroupsWithState counter
      "stream_domain_cap" -> 1,
      // near-dup screen: signature + band explode are per-row; ONE
      // exchange groups by (band, bucket) into the ownership state (the
      // post-drain per-doc fold is a batch job outside this plan)
      "stream_neardup" -> 1,
      // SCD2 maintenance: ONE exchange groups by key into the
      // open-interval state
      "stream_scd2" -> 1,
      // forget screen: STATELESS stream-static broadcast anti-join —
      // the stream side never shuffles and there is no state store; the
      // only Exchange is the docket's BroadcastExchange, printed twice
      // because a stateless micro-batch keeps AQE (initial + final plan)
      "stream_forget" -> 2,
      // constraint screen: pure per-row filter + project — NO Exchange
      // of any kind in the micro-batch plan
      "stream_constraint_gate" -> 0,
      // online quality scoring: the static vocab-model subtree (its own
      // offline exchanges) + the stream-static join + ONE stateful
      // per-doc agg exchange feeding the state store
      "stream_quality_score" -> 8)
    val over = budget.toSeq.sortBy(_._1).flatMap { case (name, cap) =>
      SparkEntry.queries(name)(spark, sf).count() // drains the stream
      val plan = graft.streaming.StreamingSync.lastRunPlan
        .getOrElse(fail(s"$name left no captured micro-batch plan"))
      val n = "Exchange".r.findAllIn(plan).size
      // the decontaminate budget counts the persisted probe subtree's
      // printed exchanges — only honest if the cache substitution fired
      if (name == "stream_decontaminate")
        assert(plan.contains("InMemoryTableScan"),
          s"$name micro-batch no longer reads the persisted probe set")
      if (n > cap) Some(s"$name: $n exchanges > budget $cap") else None
    }
    assert(over.isEmpty,
      s"streaming shuffle-budget regressions:\n  ${over.mkString("\n  ")}")
  }

  test("partitioned layout scan prunes to the filtered partition directory") {
    val df = SparkEntry.queries("s5_partitioned_prune")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    // the partition filter must appear as a PartitionFilters entry on the
    // file scan (directory-level pruning), not only as a data Filter
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"),
      s"partition filter did not reach the scan:\n$scan")
  }

  test("x_pack_greedy windows over a high-cardinality shard key") {
    // the running-sum window must not partition by lang alone (~4 values);
    // the composed (lang, md5-shard) key keeps parallelism ∝ data volume
    val df = SparkEntry.queries("x_pack_greedy")(spark, sf)
    val nShardKeys = df.select("lang", "shard").distinct().count()
    assert(nShardKeys > 16,
      s"window shard key has only $nShardKeys distinct values — " +
        "parallelism would not scale past language count")
  }

  test("pack bins respect the token budget up to one straddling document") {
    val out = SparkEntry.queries("x_pack_greedy")(spark, sf)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(4),
        r.getLong(3))) // (lang, shard, bin, n_tokens)
    val maxDoc = out.map(_._4).max
    out.groupBy(t => (t._1, t._2, t._3)).foreach { case (key, rows) =>
      val total = rows.map(_._4).sum
      assert(total < 4096 + maxDoc,
        s"bin $key holds $total tokens — exceeds budget + one straddler")
    }
    // bins are contiguous from 0 within each shard (greedy never skips)
    out.groupBy(t => (t._1, t._2)).foreach { case (key, rows) =>
      val bins = rows.map(_._3).distinct.sorted.toSeq
      assert(bins == (0L until bins.length).toSeq,
        s"shard $key has non-contiguous bins: $bins")
    }
  }

  test("split assignment lands near the declared 90/5/5 fractions") {
    val rows = SparkEntry.queries("x_split_assign")(spark, "/root/testdata/sf0.01")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.values.sum.toDouble
    assert(math.abs(rows("train") / n - 0.90) < 0.05,
      s"train fraction ${rows("train") / n} far from 0.90")
    assert(rows.keySet == Set("train", "val", "test"))
  }

  test("pipeline-e2e scan prunes to the three referenced columns") {
    val plan = SparkEntry.queries("x_pipeline_e2e")(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length == 3,
      s"expected doc_id/lang/text only, got: $readSchema")
  }

  test("watermark predicate pushes into the parquet scan") {
    val plan = SparkEntry.queries("p3_watermark_pk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*GreaterThan".r.findFirstIn(plan).isDefined,
      s"incremental > predicate must reach the scan; plan was:\n$plan")
  }

  test("catalog left join broadcasts the small dimension side") {
    // guards the explicit broadcast hint on the region dimension from
    // being dropped — the planner would usually still broadcast at this
    // size, but the hint is the declared 100 TB posture
    val plan = SparkEntry.queries("j4_left_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "region dim must broadcast (hint dropped?), not shuffle both sides")
  }

  test("parquet scans prune columns: s1 reads only the projected four") {
    val plan = SparkEntry.queries("s1_scan_project")(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length == 4,
      s"expected 4 pruned columns, got: $readSchema")
  }
}
