package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus bigram language-model scoring — the LM-fluency quality filter of
  * web-corpus pipelines (CCNet-style perplexity filtering), re-expressed
  * integer-exact so the DuckDB oracle matches bit-for-bit.
  *
  * Model: for each adjacent token pair (w1, w2), surprisal ≈
  * floor(log2(c1/c2)) + 1 bits computed as `length(bin(c1 div c2))` where
  * c2 = corpus count of the bigram and c1 = corpus count of w1 as a bigram
  * head. c1 ≥ c2 ≥ 1 always (the corpus contains the doc being scored), so
  * no smoothing term is needed and the ratio is a positive integer. Incoherent
  * token salads score high (every continuation is rare given its head);
  * templated/repetitive text scores near 1 bit per token. No float logs
  * anywhere — engine libm differences in `ln` would break oracle parity
  * (same idiom as the rarity scorer's `length(bin(...))` bits).
  *
  * Scale shape (the 100 TB contract): bigram *instances* collapse FIRST to
  * per-doc multiplicity (doc_id, w1, w2, m) — one corpus-wide shuffle with
  * map-side partial aggregation — and the vocabulary-sized c2/c1 model
  * tables derive from THAT collapsed table, never from a second pass over
  * raw instances. The model rejoins on (w1, w2)/(w1): equi-joins only, hot
  * bigrams split by AQE skew handling. No broadcast assumption — a
  * web-scale bigram vocabulary is itself billions of rows. The collapsed
  * per-doc table is persisted because it feeds both the model derivation
  * and the final scoring join (released via [[CacheRegistry]]).
  */
object LangModel {

  /** Per-document bigram-LM score over `df`: (id, n_bigrams, nll_bits,
    * avg_bits_e2) where nll_bits = Σ m·surprisal and avg_bits_e2 is the
    * ×100-scaled integer mean (exact integer division, same convention as
    * `rarity_e2`). Documents with fewer than two tokens carry no bigram
    * evidence and are absent from the result.
    */
  def bigramLmScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perDoc = CacheRegistry.register(
      bigramMultiplicities(df, idCol, textCol).persist())
    val c2 = perDoc.groupBy("w1", "w2").agg(sum(col("m")).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val surb = length(bin(expr("c1 div c2"))).cast("long")
    perDoc.join(c2.join(c1, "w1"), Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(sum(col("m")).as("n_bigrams"),
        sum((col("m") * surb).cast("long")).as("nll_bits"))
      .select(col(idCol), col("n_bigrams"), col("nll_bits"),
        expr("(nll_bits * 100) div n_bigrams").as("avg_bits_e2"))
  }

  /** Adjacent-token-pair multiplicities per document: (id, w1, w2, m).
    * Pair extraction is a pure per-row expression (`transform` over an
    * index sequence — 0-based in Spark, mirrored 1-based in the oracle);
    * the groupBy is the single instance-level shuffle of the whole
    * operator.
    */
  def bigramMultiplicities(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i - 1] AS w1, toks[i] AS w2))")).as("bg"))
      .select(col(idCol), col("bg.w1"), col("bg.w2"))
      .groupBy(idCol, "w1", "w2").agg(count(lit(1)).as("m"))
}
