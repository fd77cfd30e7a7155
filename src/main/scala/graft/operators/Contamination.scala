package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find evaluation documents that share long
  * n-gram runs with training documents — the standard train/test
  * contamination check run before training on a scraped corpus (the same
  * n-gram-overlap formulation the GPT-3/PaLM/Llama reports describe).
  *
  * Shape: each side emits its distinct n-gram fingerprints (md5 — the
  * 32-byte shuffle key, never the text), non-discriminative n-grams that
  * occur in more than `maxDocFreq` training docs are dropped (boilerplate
  * carries no contamination signal and would otherwise fan the join out
  * quadratically — same guard philosophy as Dedup's LSH bucket cap), and
  * one equi-join on the fingerprint + count aggregation yields
  * (eval_id, train_id, n_shared). Everything shuffles by fingerprint or by
  * doc pair — no cross join at any corpus size.
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
        explode(array_distinct(Dedup.shinglesFromTokens(col("toks"), n)))
          .as("sh"))
      .select(col(as), md5(col("sh")).as("fp"))
    val train = fps(trainDocs, "train_id")
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
}
