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
  *  - pass 2 pairs strings sharing their last `blockLen` chars.
  *
  * An edit within the prefix still lands the pair in the suffix block and
  * vice versa, so single-region edits (the overwhelming near-dup case) are
  * always candidates. Pairs edited in BOTH regions can escape — this is
  * the standard recall/cost trade of multi-pass blocking, documented
  * rather than hidden; a provably complete scheme for distance ≤ d
  * partitions each string into d+1 segments (PassJoin) at proportionally
  * higher candidate volume.
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
    val names = df.select(col(nameCol).as("n")).where(col("n").isNotNull).distinct()

    def pass(key: Column): DataFrame = {
      val keyed = names.select(col("n"), key.as("k"))
      val capped = Dedup.capBuckets(keyed, Seq("k"), maxBlock)
      val a = capped.select(col("n").as("left"), col("k"))
      val b = capped.select(col("n").as("right"), col("k"))
      a.join(b, "k").where(col("left") < col("right")).drop("k")
    }

    val prefix = pass(substring(col("n"), 1, blockLen))
    val suffix = pass(substring(col("n"), -blockLen, blockLen))
    prefix.union(suffix).distinct()
      .withColumn("dist", levenshtein(col("left"), col("right")))
      .where(col("dist") <= maxDist)
  }
}
