package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) self-join — the entity-resolution /
  * near-identical-title matching shape of a curation pipeline.
  *
  * The naive form is an O(n²) cross join with `levenshtein` on every pair;
  * at corpus scale that is never runnable. The classic fix is BLOCKING:
  * generate candidate pairs from cheap equi-joins on short derived keys,
  * then verify only candidates with the expensive distance. Here we use
  * multi-pass prefix + suffix blocking — two equi-joins, union, distinct:
  *
  *  - pass 1 pairs strings sharing their first `blockLen` chars,
  *  - pass 2 pairs strings sharing their last `blockLen` chars,
  *  - pass 3 pairs ALL strings shorter than 2·blockLen with each other.
  *
  * For strings of length ≥ 2·blockLen the prefix and suffix regions are
  * disjoint, so an edit within one region still lands the pair in the
  * other region's block: single-region edits (the overwhelming near-dup
  * case) are always candidates. BELOW 2·blockLen the regions overlap and
  * a single mid-string edit changes BOTH keys — which is why short
  * strings get the dedicated third pass (one shared block, exact recall
  * among them, bounded like any block by `maxBlock`; the distinct short
  * strings of a name corpus are few). Pairs edited in BOTH regions can
  * still escape — the standard recall/cost trade of multi-pass blocking,
  * documented rather than hidden; a provably complete scheme for
  * distance ≤ d partitions each string into d+1 segments (PassJoin) at
  * proportionally higher candidate volume.
  *
  * Scale: every stage is an equi-join on a short key — shuffles are
  * bounded by block sizes, never n². Degenerate blocks (everything shares
  * one prefix) are capped with `maxBlock`, mirroring the LSH bucket guard
  * in [[Dedup]]: a block that big is boilerplate, not a match candidate.
  */
object FuzzyJoin {

  /** Candidate pairs (left < right) whose edit distance ≤ `maxDist`, from
    * the distinct values of `nameCol`. Output: (left, right, dist).
    */
  def fuzzyPairs(df: DataFrame, nameCol: String, maxDist: Int,
                 blockLen: Int = 3, maxBlock: Int = 10000): DataFrame = {
    // persisted: all three blocking passes re-derive their keys from this
    // distinct-names table — unpersisted, the scan + distinct exchange
    // would run once PER PASS (no auto-CSE across the union's subtrees)
    val names = CacheRegistry.register(
      df.select(col(nameCol).as("n")).where(col("n").isNotNull).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    def pass(key: Column): DataFrame = {
      val keyed = names.select(col("n"), key.as("k"))
      val capped = Dedup.capBuckets(keyed, Seq("k"), maxBlock)
      val a = capped.select(col("n").as("left"), col("k"))
      val b = capped.select(col("n").as("right"), col("k"))
      a.join(b, "k").where(col("left") < col("right")).drop("k")
    }

    val prefix = pass(substring(col("n"), 1, blockLen))
    val suffix = pass(substring(col("n"), -blockLen, blockLen))
    // short strings: prefix/suffix regions overlap below 2·blockLen, so a
    // single overlap edit changes both keys — block them all together
    // instead (NULL key excludes long strings from the pass entirely)
    val short = pass(when(length(col("n")) < 2 * blockLen, lit(""))
      .otherwise(lit(null).cast("string")))
    prefix.union(suffix).union(short).distinct()
      .withColumn("dist", levenshtein(col("left"), col("right")))
      .where(col("dist") <= maxDist)
  }
}
