package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find evaluation documents that share long
  * n-gram runs with training documents — the standard train/test
  * contamination check run before training on a scraped corpus (the same
  * n-gram-overlap formulation the GPT-3/PaLM/Llama reports describe).
  *
  * Shape: each side emits its distinct n-gram fingerprints (XXH64 over
  * the token-array slice — an 8-byte shuffle key, never the text; see
  * Dedup.gramHashes for the collision argument), non-discriminative
  * n-grams that occur in more than `maxDocFreq` training docs are dropped
  * (boilerplate carries no contamination signal and would otherwise fan
  * the join out quadratically — same guard philosophy as Dedup's LSH
  * bucket cap), and one equi-join on the fingerprint + count aggregation
  * yields (eval_id, train_id, n_shared). Everything shuffles by
  * fingerprint or by doc pair — no cross join at any corpus size.
  */
object Contamination {

  /** Shared distinct-`n`-gram counts between every (eval, train) doc pair
    * with at least one shared discriminative n-gram.
    */
  def ngramOverlapPairs(evalDocs: DataFrame, trainDocs: DataFrame,
                        idCol: String, textCol: String,
                        n: Int = 8, maxDocFreq: Int = 128): DataFrame = {
    def fps(df: DataFrame, as: String): DataFrame = df
      .select(col(idCol).as(as), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(as),
        explode(array_distinct(Dedup.gramHashes(col("toks"), n))).as("fp"))
    // persist the train fingerprints: the df-cap aggregation and the
    // anti-join side both consume them — without the persist the
    // tokenize→gram-hash pipeline runs twice over the (large) train side
    val train = CacheRegistry.register(fps(trainDocs, "train_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // boilerplate blocklist: n-grams in > maxDocFreq train docs. The
    // groupBy partial-aggregates map-side; the heavy-fp list is usually
    // small (the boilerplate tail) but grows with corpus size, so NO
    // broadcast hint — AQE broadcasts the anti join while the list fits
    // and falls back to a shuffled anti join when it doesn't
    val heavy = train.groupBy("fp").agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDocFreq).select("fp")
    val trainCapped = train.join(heavy, Seq("fp"), "left_anti")
    fps(evalDocs, "eval_id").join(trainCapped, "fp")
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[ngramOverlapPairs]] with a Bloom-filter gate on the train side —
    * the 100 TB shape of the same check. The eval set's distinct n-gram
    * fingerprints aggregate into ONE serialized Bloom filter (a few MB of
    * bits for millions of grams), which broadcasts with the 1-row cross
    * join and prunes the train side's gram stream BEFORE anything
    * shuffles: a train gram that cannot be in the eval set never enters
    * the df-cap aggregation or the join exchange. At a 5%-eval / 95%-train
    * split that drops ~the whole train side at the scan. The filter rides
    * the task closure as a literal (numBits/8 bytes), so the plan gains a
    * Filter, not a join.
    *
    * EXACTLY the ungated result: Bloom filters have no false negatives,
    * and every false positive fails the exact fingerprint equi-join
    * downstream (the df-cap verdict is also unchanged — the gate keeps or
    * drops a gram's occurrences atomically, so surviving grams carry
    * their full document frequency). Equivalence law pinned in
    * ContaminationSpec; the gate's plan position in PlanAuditSpec.
    */
  def bloomGatedOverlapPairs(evalDocs: DataFrame, trainDocs: DataFrame,
                             idCol: String, textCol: String,
                             n: Int = 8, maxDocFreq: Int = 128,
                             expectedItems: Long = 1L << 20,
                             numBits: Long = 1L << 23): DataFrame = {
    def fps(df: DataFrame, as: String): DataFrame = df
      .select(col(idCol).as(as), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(as),
        explode(array_distinct(Dedup.gramHashes(col("toks"), n))).as("fp"))
    // persist the eval fps: the bloom build (eager, below) and the exact
    // confirm join both consume them — without the persist the eval
    // tokenize→gram-hash pipeline runs twice (no cross-job reuse)
    val ev = CacheRegistry.register(fps(evalDocs, "eval_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // ONE driver-side scalar: the serialized filter (might_contain requires
    // a constant/scalar-subquery bloom). Same bounded-collect contract as
    // the watermark scalars — numBits/8 bytes however large the corpus —
    // and as a literal it ships with the task closure, so the gate sits
    // directly on the train scan with no join node at all.
    val bfBytes = ev.agg(
      graft.functions.Sketch.bloomAgg(col("fp"), expectedItems, numBits)
        .as("bf")).head().getAs[Array[Byte]](0)
    // empty eval set → null filter → nothing can overlap. The empty
    // frame takes its id types from the INPUTS (a hardcoded lit(0L)
    // would type eval_id/train_id BIGINT and schema-mismatch the normal
    // path on a string-id corpus, failing any union/write exactly on
    // the edge that should be a clean no-op)
    if (bfBytes == null)
      return evalDocs.select(col(idCol).as("eval_id")).limit(0)
        .crossJoin(trainDocs.select(col(idCol).as("train_id")).limit(0))
        .withColumn("n_shared", lit(0L))
    val train = fps(trainDocs, "train_id")
      .where(graft.functions.Sketch.mightContain(lit(bfBytes), col("fp")))
    val heavy = train.groupBy("fp").agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDocFreq).select("fp")
    ev.join(train.join(heavy, Seq("fp"), "left_anti"), "fp")
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Surgical decontamination: instead of DROPPING every training document
    * that overlaps the eval set (ngramOverlapPairs' readout), emit the
    * merged 1-based token ranges inside each training doc that verbatim-
    * match an eval doc for ≥ `minSpanTokens` tokens — cut the span, keep
    * the document (the Lee-et-al-style span surgery applied to benchmark
    * decontamination). Positional n-gram postings on both sides, diagonal
    * gaps-and-islands for run length (same core as Dedup.substringSpans),
    * ranges merged per train doc via the shared interval pass.
    *
    * Scale: the df-cap drops train grams present in > `maxDocFreq` train
    * docs BEFORE the join (boilerplate immunity); the eval side is tiny by
    * construction, so the join fan-out is |eval postings| × ≤maxDocFreq.
    * Output: (doc_id, cut_start, cut_len) for train docs only.
    */
  def decontaminationMask(evalDocs: DataFrame, trainDocs: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 8, minSpanTokens: Int = 16,
                          maxDocFreq: Int = 128): DataFrame = {
    def posts(df: DataFrame, as: String, posAs: String): DataFrame =
      Dedup.postings(df, idCol, textCol, n)
        .select(col("doc").as(as), col("pos").as(posAs), col("h"))
    // persist the train postings: the df-cap aggregation and the anti-join
    // side both consume them — without the persist the tokenize→gram-hash
    // pipeline runs twice over the (large) train side
    val tr = CacheRegistry.register(posts(trainDocs, "train_id", "pt")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // df-cap without shuffling raw posting volume: see Dedup.heavyGrams
    val heavy = Dedup.heavyGrams(tr, "train_id", maxDocFreq)
    // islands natively (r16): each match rides as one packed
    // ((diff + 2³¹) << 32 | pe) long, grouped once per (eval, train)
    // pair, and all diagonals' runs come from a single codegen'd
    // sort+walk (Dedup.spanRuns carries the full rationale).
    // pt_start reconstructs as pe_start − diff (pt = pe − diff is
    // constant on a diagonal, so min(pt) = min(pe) − diff).
    val ranges = posts(evalDocs, "eval_id", "pe")
      .join(tr.join(heavy, Seq("h"), "left_anti"), Seq("h"))
      .groupBy("eval_id", "train_id")
      .agg(collect_list(shiftleft(
        col("pe").cast("long") - col("pt").cast("long") + lit(0x80000000L), 32)
        .bitwiseOR(col("pe").cast("long"))).as("packed"))
      .select(col("train_id"),
        explode(graft.functions.NativeExpressions.diagonalRunsPacked(
          col("packed"))).as("r"))
      .withColumn("span", (col("r.run") + (n - 1)).cast("long"))
      .where(col("span") >= minSpanTokens)
      .select(col("train_id").as("doc"),
        (col("r.pa_start") - col("r.diff")).cast("long").as("st"),
        (col("r.pa_start") - col("r.diff") + col("span") - 1).cast("long")
          .as("en"))
    Dedup.mergeTokenRanges(ranges)
  }
}
