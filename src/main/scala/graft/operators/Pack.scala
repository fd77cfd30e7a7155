package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing operators for training-data assembly — how documents
  * become fixed-budget training sequences / balanced shards. Three layouts
  * ship, matching how real pipelines trade packing quality against
  * parallelism (the contiguous cumsum layout lives in Pipeline's
  * `x_pack_greedy`):
  *
  *  - `serpentine`: LPT-style balanced dealing — docs sorted by size desc
  *    are dealt across bins down-and-back (boustrophedon), pairing heavy
  *    rows with light ones each pass. One window over (lang), pure
  *    SQL-expressible, oracle-exact.
  *  - `bestFitDecreasing`: true capacity packing (no straddle): each doc
  *    lands in the fullest bin that still fits, new bin otherwise. Bin
  *    reset is inherently sequential state, inexpressible as a window —
  *    this is the documented last-resort case for typed per-group logic
  *    (`flatMapGroups`), kept scalable by running per (lang, md5-shard)
  *    group: parallelism = langs × `shards`, and each group's state is
  *    one fill array.
  *
  * Scale (100 TB): both partitionings are pure functions of (lang,
  * doc_id), so layouts are deterministic under retries and the shard
  * count is the parallelism knob (raise it for bigger clusters; results
  * change only by design, never by scheduling). No driver-side state.
  */
object Pack {

  /** Balanced shard assembly: serpentine deal of size-desc docs across
    * `nBins` bins per lang. Deterministic, one shuffle (the window sort).
    * Output: (doc_id, lang, n_tokens, bin).
    */
  def serpentine(docs: DataFrame, nBins: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(desc("n_tokens"), asc("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("r", (row_number().over(w) - 1) % (2 * nBins))
      .withColumn("bin", when(col("r") < nBins, col("r"))
        .otherwise(lit(2 * nBins - 1) - col("r")).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin"))
  }

  /** Typed row for the best-fit packer's output (Encoder-derived schema). */
  case class PackedDoc(doc_id: Long, lang: String, shard: Int,
                       n_tokens: Long, bin: Int, bin_fill: Long)

  /** Best-fit-decreasing capacity packing per (lang, md5(doc_id)-shard)
    * group: docs sorted size-desc; each goes to the FULLEST bin that still
    * fits `cap`, else opens a new bin; docs longer than `cap` get a
    * singleton bin (they'd be chunked upstream — `x_chunk_docs`).
    * `bin_fill` is the running fill AFTER placing the doc, so the final
    * row per bin carries its total.
    *
    * Group state is one fill array (≤ group size); a group is one shard of
    * one language, so memory is bounded by the shard knob, not the corpus.
    */
  def bestFitDecreasing(docs: DataFrame, cap: Long,
                        shards: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      // null ids can't be packed (and the tuple encoder's Long slots are
      // non-nullable); null text packs as a zero-length doc
      .where(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"), col("lang"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int") % shards).as("shard"),
        coalesce(TextAnalysis.tokenCount(col("text")), lit(0L)).as("n_tokens"))
      .as[(Long, String, Int, Long)]
      .groupByKey { case (_, lang, shard, _) => (lang, shard) }
      .flatMapGroups { (key: (String, Int),
                        it: Iterator[(Long, String, Int, Long)]) =>
        val (lang, shard) = key
        val ds = it.toIndexedSeq.sortBy { case (id, _, _, n) => (-n, id) }
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        ds.iterator.map { case (id, _, _, n) =>
          var best = -1
          var bestFill = -1L
          var i = 0
          while (i < fills.length) {
            if (fills(i) + n <= cap && fills(i) > bestFill) {
              best = i; bestFill = fills(i)
            }
            i += 1
          }
          val b = if (best < 0) { fills += 0L; fills.length - 1 } else best
          fills(b) += n
          PackedDoc(id, lang, shard, n, b, fills(b))
        }
      }
      .toDF()
  }
}
