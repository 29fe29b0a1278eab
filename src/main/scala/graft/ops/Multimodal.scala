package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata travelling alongside. The decode step is a STUB
  * (no image/audio codecs in this environment — see `decodeStub`), but the
  * Spark-side structure is real and tested: schema, per-partition batched
  * processing (the JVM analog of `mapInPandas` batches), and deterministic
  * feature outputs that a real decoder would replace.
  *
  * At scale: binary payloads dominate row size, so the pipeline keeps them
  * in one `binary` column (columnar parquet stores them contiguously),
  * projects metadata early, and processes partitions iterator-to-iterator
  * (no per-row task overhead, constant memory).
  */
object Multimodal {

  /** Extracted features for one media payload. */
  case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      checksum4: Long,
      digest: String)

  /** STUB decoder: stands in for image/audio decode + feature extraction.
    * Deterministic on the payload bytes: length, sum of the first 4 byte
    * values, and the md5 digest. A real deployment swaps only this
    * function body (signature and batch shape stay). */
  def decodeStub(id: Long, payload: Array[Byte]): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map(b => f"$b%02x").mkString
    val checksum = payload.take(4).map(b => (b & 0xffL)).sum
    MediaFeatures(id, payload.length.toLong, checksum, hex)
  }

  /** Wrap a text column as a binary payload column (UTF-8), the shape a
    * real media table would have (`payload binary, meta struct<...>`). */
  def asBinaryTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).cast(LongType).as("byte_len"),
        lit("text/plain").as("mime")).as("meta"))

  /** Per-partition batched feature extraction over the binary column:
    * iterator-in → iterator-out, the Dataset equivalent of a Pandas-UDF
    * batch loop. Returns (doc_id, byte_len, checksum4, digest). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeStub(id, payload) })
      .toDF()
  }
}
