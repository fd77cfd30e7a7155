package graft

import org.apache.spark.sql.functions._

/** Seed-varied corpus generator for the overfit-constant gate:
  * `runMain graft.SeedVary <srcDir> <dstDir> <seed>` rewrites the
  * driver-generated corpus into a SAME-SHAPE, DIFFERENT-HASH-REALIZATION
  * twin, so the full Verify + DuckDB oracle suite re-proves every tuned
  * constant (LSH `bitsPerTable` occupancy derivation, df/bucket caps,
  * bottom-k draws, SimHash planes, ANN cell sizing) on a second draw of
  * the hash dice. The round-14 `bitsPerTable` sf3 zero-candidate defect
  * is the motivating class: a constant proven on ONE deterministic
  * corpus can silently encode that corpus's hash realization; this tool
  * catches it in-sandbox (round-15 verdict ask #5) without waiting for a
  * new scale factor to expose it.
  *
  * What varies — and what deliberately does not:
  *
  *   - `documents.text` goes through a seeded LETTER SUBSTITUTION CIPHER
  *     (a Fisher–Yates permutation of a–z from a splitmix-style LCG,
  *     mirrored on A–Z; digits, punctuation, and whitespace untouched).
  *     A bijection on the alphabet is a bijection on tokens and on
  *     n-gram shingles, so the corpus SHAPE is preserved exactly —
  *     token/shingle df distributions, duplicate and near-duplicate
  *     structure, document lengths (`n_chars` is unchanged), word-length
  *     and punctuation statistics — while every md5/xxhash VALUE in the
  *     dedup/text pipeline changes. That is precisely the axis the
  *     overfit-constant law needs varied, with zero risk of destroying
  *     the planted dup/near-dup fixtures parity depends on (a token
  *     PERMUTATION — ScaleUp's replica transform — would). Alphabet-
  *     dependent signals (stopword ratios, language ID) do collapse
  *     under a cipher; their constants are not hash-realization-
  *     dependent and stay split-proven on the original corpus's CHECK.
  *   - `embeddings.embedding` gets ScaleUp's isometry-plus-noise replica
  *     transform keyed by the seed (dimension rotation by (7·seed) mod
  *     dim + a per-slot seeded hash epsilon of ±0.1): within-corpus
  *     pairwise similarity structure is near-preserved, but every ANN
  *     cell/bucket assignment and IVF centroid draw re-rolls.
  *   - Keys, foreign keys, dimensions, and the relational tables are
  *     copied BYTE-IDENTICAL (filesystem copy — row-group layout and
  *     all): their queries are plain SQL with no tuned constants, and
  *     stable join selectivity keeps the two CHECK artifacts comparable.
  *
  * The oracle needs no changes: Verify and DuckDB both read the
  * transformed parquet, so parity is re-proven end-to-end on the new
  * realization. Deterministic by construction (LCG + hash columns, no
  * RNG) — reruns are byte-stable, same as ScaleUp.
  */
object SeedVary {

  /** Seeded permutation of 'a'..'z' via Fisher–Yates driven by a 64-bit
    * LCG (MMIX constants) — deterministic, seed-sensitive in every
    * position. */
  private[graft] def cipherOf(seed: Int): String = {
    val a = ('a' to 'z').toArray
    var s = seed.toLong * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    def next(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound + bound) % bound).toInt
    }
    var i = a.length - 1
    while (i > 0) {
      val j = next(i + 1)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    new String(a)
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, seedStr) = args
    val seed = seedStr.toInt
    require(seed != 0, "seed 0 is the driver corpus itself — pick another")
    val spark = LocalSession.build(logLevel = "ERROR")
    new java.io.File(dstDir).mkdirs()

    // untouched tables: byte-identical filesystem copies (preserves the
    // row-group layout — the scan-parallelism quantum — exactly)
    val copied = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events")
    copied.foreach { t =>
      val src = java.nio.file.Paths.get(srcDir, s"$t.parquet")
      val dst = java.nio.file.Paths.get(dstDir, s"$t.parquet")
      java.nio.file.Files.copy(src, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[seedvary] $t -> $dst (copied)")
    }

    val lowerTo = cipherOf(seed)
    val lowerFrom = ('a' to 'z').mkString
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .withColumn("text", translate(col("text"),
        lowerFrom + lowerFrom.toUpperCase, lowerTo + lowerTo.toUpperCase))
    ScaleUp.one(spark, docs, dstDir, "documents", srcDir)

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val embDim = {
      val row = emb.agg(max(size(col("embedding")))).head()
      if (row.isNullAt(0)) 1 else math.max(row.getInt(0), 1)
    }
    val k = ((seed * 7) % embDim).max(1)
    val rotated = emb
      .withColumn("embedding", when(col("embedding").isNull, col("embedding"))
        .otherwise(concat(
          slice(col("embedding"), lit(k + 1), size(col("embedding")) - lit(k)),
          slice(col("embedding"), lit(1), lit(k)))))
      .withColumn("embedding", transform(col("embedding"), (x, j) =>
        (x + (pmod(hash(col("vec_id"), j, lit(seed)), lit(2001)) - lit(1000))
          .cast("float") / lit(10000.0f)).cast("float")))
    ScaleUp.one(spark, rotated, dstDir, "embeddings", srcDir)

    spark.stop()
    println(s"[seedvary] done: $dstDir = $srcDir at seed $seed")
  }
}
