package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * steps as partition-batched transforms.
  *
  * The container has no image/audio codecs, so the decode step is a
  * STUBBED deterministic fake (clearly marked below) — what is real and
  * tested is the Spark-side shape: binary column handling, metadata schema,
  * `mapPartitions` batching, and partitioning behavior, which is exactly
  * what a real decoder (JNI/FFI or Pandas-UDF-style batch) plugs into.
  *
  * Scale notes: payload bytes stay columnar in parquet; the decode transform
  * is a narrow map (no shuffle) so it scales linearly with executors;
  * `spark.sql.files.maxPartitionBytes` bounds per-task memory for large
  * blobs.
  */
object Multimodal {

  /** Binary payload + pure-SQL metadata (real, oracle-checkable): byte
    * length, md5 digest, hex prefix. `payload` here is the utf-8 encoding of
    * the text column — standing in for image bytes.
    */
  def withPayloadMeta(df: DataFrame, textCol: String): DataFrame = {
    val bin = encode(col(textCol), "utf-8")
    df.withColumn("n_bytes", length(bin).cast("long"))
      .withColumn("digest", md5(bin))
      .withColumn("head_hex", hex(substring(bin, 1, 8)))
  }

  case class DecodedFeature(doc_id: Long, width: Int, height: Int,
                            n_frames: Int, hex_mean: Double)

  /** STUB DECODE — deterministic fake image decoder, oracle-checkable.
    *
    * A real implementation would decode `payload` with an image library and
    * emit (width, height, frames, features); none ships in this container,
    * so every fake feature is a pure function of the payload's md5 hex
    * digest and byte length — functions an oracle engine can mirror in SQL
    * (md5 / ascii / octet_length), so even the stub gets a hash-checked
    * correctness row. The batching shape (`mapPartitions` over an iterator,
    * one output row per input row, explicit output schema) is the
    * production shape for a JNI decoder.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    import spark.implicits._
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "utf-8").as("payload"))
    src.as[(Long, Array[Byte])].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        // ??? real decoder goes here; md5-derived deterministic fake below
        md.reset()
        val hex = md.digest(bytes).map("%02x".format(_)).mkString
        DecodedFeature(id,
          16 + hex(0).toInt % 16,
          16 + hex(1).toInt % 16,
          1 + bytes.length % 8,
          hex.map(_.toInt).sum.toDouble / 32)
      }
    }.toDF()
  }
}
