package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Hash functions are built from `md5` hex strings (available identically in
  * Spark and any oracle engine) rather than engine-private hashes, so every
  * stage is cross-engine deterministic. Lexicographic MIN over hex digests is
  * a valid MinHash (uniform order on the digest space).
  *
  * Scale design (100 TB):
  *  - exact dedup = hash-aggregate on the text (or its md5) — one shuffle on
  *    the fingerprint, map-side partial aggregation first;
  *  - MinHash: explode→min-agg shuffles one row per (doc, shingle) but
  *    partial-aggregates the per-seed MINs map-side to one row per doc;
  *    the LSH band join then shuffles only (doc, band-signature) pairs —
  *    never a cross join;
  *  - SimHash: pure per-row expression work then a band-bucket self-join;
  *  - embedding near-dup: cell-bucketed join (see Similarity.ivfTopK) with
  *    exact integer dot products.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per identical text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))

  /** 3-word shingles of the lowercased whitespace tokenization. Documents
    * shorter than `n` tokens get their full token string as one shingle.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
  }

  /** Per-doc MinHash signature: for seed s, MIN over shingles of
    * md5("s|" + shingle) — one min-aggregate per seed, partial-aggregated
    * map-side. Returns (id, h0..h{k-1}).
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 16): DataFrame = {
    val exploded = df.select(col(idCol).as("doc"),
      explode(array_distinct(shingles(col(textCol)))).as("sh"))
    val aggs = (0 until numHashes).map(s =>
      min(md5(concat(lit(s + "|"), col("sh")))).as(s"h$s"))
    exploded.groupBy(col("doc")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: group `numHashes` minhashes into bands of `bandSize`,
    * md5 the concatenation per band, emit (doc, band_idx, band_sig).
    */
  def lshBands(sig: DataFrame, numHashes: Int = 16, bandSize: Int = 4): DataFrame = {
    val bands = (0 until numHashes / bandSize).map { b =>
      val cols = (0 until bandSize).map(i => col(s"h${b * bandSize + i}"))
      struct(lit(b).as("band_idx"), md5(concat(cols: _*)).as("band_sig"))
    }
    sig.select(col("doc"), explode(array(bands: _*)).as("band"))
      .select(col("doc"), col("band.band_idx").as("band_idx"),
        col("band.band_sig").as("band_sig"))
  }

  /** MinHash+LSH candidate pairs: docs sharing any band bucket. The self-join
    * is an equi-join on (band_idx, band_sig) — shuffle-partitioned by bucket,
    * never a cross join. Distinct pairs with a < b.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16, bandSize: Int = 4): DataFrame = {
    val bands = lshBands(minhashSignature(df, idCol, textCol, numHashes),
      numHashes, bandSize)
    val a = bands.select(col("doc").as("a"), col("band_idx"), col("band_sig"))
    val b = bands.select(col("doc").as("b"), col("band_idx"), col("band_sig"))
    a.join(b, Seq("band_idx", "band_sig")).where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Token-set Jaccard for candidate pairs (exact integer set sizes; the
    * ratio is a single int/int division). `blockCols` bounds the pair space
    * (same-language+source blocking here; LSH buckets in minhashCandidates).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCols: Seq[String], threshold: Double): DataFrame = {
    val base = df.select(Seq(col(idCol).as("id"),
      array_distinct(TextAnalysis.tokens(col(textCol))).as("toks")) ++
      blockCols.map(col): _*)
    val a = base.toDF(base.columns.map(c => if (c == "id" || c == "toks") s"a_$c" else c): _*)
    val b = base.toDF(base.columns.map(c => if (c == "id" || c == "toks") s"b_$c" else c): _*)
    val inter = size(array_intersect(col("a_toks"), col("b_toks"))).cast("long")
    val uni = size(array_union(col("a_toks"), col("b_toks"))).cast("long")
    a.join(b, blockCols).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), inter.as("n_inter"), uni.as("n_union"),
        (inter.cast("double") / uni.cast("double")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash from md5 hex-digit parity: bit i of a token's hash is
    * `ascii(hex_digit_i(md5(token))) % 2`; the doc bit is the majority vote
    * over tokens. Cross-engine deterministic (md5 + ascii only).
    */
  def simhash32(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("doc"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until 32).map(i =>
      sum((ascii(substring(col("h"), i + 1, 1)) % 2).cast("long")).as(s"s$i"))
    val agged = exploded.groupBy(col("doc"))
      .agg(bitSums.head, bitSums.tail :+ count(lit(1)).as("n_tok"): _*)
    val sim = (0 until 32).map(i =>
      when(col(s"s$i") * 2 >= col("n_tok"), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agged.select(col("doc"), sim.as("simhash"),
      (sim % 65536).as("band_lo"), (sim.cast("long") / 65536).cast("long").as("band_hi"))
  }

  /** Embedding near-duplicates: pairs in the same coarse cell with cosine
    * above threshold, from exact integer dot/norms (bit-deterministic).
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       cellCol: String, threshold: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(cellCol).as("cell"),
      Similarity.quantize(col(vecCol)).as("vq"))
    val a = base.select(col("id").as("a_id"), col("cell"), col("vq").as("a_vq"))
    val b = base.select(col("id").as("b_id"), col("cell"), col("vq").as("b_vq"))
    a.join(b, Seq("cell")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("cell"),
        Similarity.cosineFromQ(Similarity.dotQ(col("a_vq"), col("b_vq")),
          Similarity.norm2Q(col("a_vq")), Similarity.norm2Q(col("b_vq"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
