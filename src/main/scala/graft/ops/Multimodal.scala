package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata travelling alongside. IMAGE payloads (JPEG/PNG/
  * GIF/BMP, magic-byte detected) get a REAL decode via [[ImageDecode]]
  * (javax.imageio — ships with the JDK): feature extraction, resampling
  * and the perceptual hash all operate on decoded luma pixels. Audio/
  * video codecs are absent in this environment, so non-image payloads
  * keep a deterministic byte-level contract (see `decodeStub`) behind the
  * same Spark-side structure: schema, per-partition batched processing
  * (the JVM analog of `mapInPandas` batches), iterator-to-iterator.
  *
  * At scale: binary payloads dominate row size, so the pipeline keeps them
  * in one `binary` column (columnar parquet stores them contiguously),
  * projects metadata early, and processes partitions iterator-to-iterator
  * (no per-row task overhead, constant memory).
  */
object Multimodal {

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of a byte array. A lookup-table loop, NOT per-byte
    * `f"%02x"` formatting — `java.util.Formatter` allocation per byte costs
    * ~50x and dominates a frame-sampling pass that hexes millions of tiny
    * frames. */
  private[graft] def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(i * 2) = HexChars(v >> 4)
      out(i * 2 + 1) = HexChars(v & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Extracted features for one media payload. */
  case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      checksum4: Long,
      digest: String)

  /** Byte-level decoder for NON-IMAGE payloads (and the bomb-guard
    * fallback): deterministic on the payload bytes — length, sum of the
    * first 4 byte values, md5 digest. Image payloads take the REAL decode
    * path in `decodeFeatures` instead. */
  def decodeStub(id: Long, payload: Array[Byte]): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = toHex(md.digest(payload))
    val checksum = payload.take(4).map(b => (b & 0xffL)).sum
    MediaFeatures(id, payload.length.toLong, checksum, hex)
  }

  /** Feature extraction with REAL image decode: JPEG/PNG/GIF/BMP payloads
    * (magic-byte detected — invalid UTF-8 prefixes, so text payloads never
    * route here) are decoded via javax.imageio ([[ImageDecode]]); features
    * then come from the DECODED pixels: `checksum4` = sum of the first 4
    * luma values, `digest` = md5 of the luma byte plane (a content
    * fingerprint of what the image SHOWS, invariant to container metadata
    * like EXIF edits or PNG chunk reordering). `byte_len` stays the
    * payload byte length — it is storage metadata either way. Non-image
    * or undecodable payloads keep the byte-stub contract. */
  def decodeFeatures(id: Long, payload: Array[Byte]): MediaFeatures =
    ImageDecode.decodeGray(payload) match {
      case Some(g) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        var checksum = 0L
        var j = 0
        while (j < 4 && j < g.luma.length) { checksum += g.luma(j) & 0xff; j += 1 }
        MediaFeatures(id, payload.length.toLong, checksum, toHex(md.digest(g.luma)))
      case None => decodeStub(id, payload)
    }

  /** Wrap a text column as a binary payload column (UTF-8), the shape a
    * real media table would have (`payload binary, meta struct<...>`). */
  def asBinaryTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // null media rows carry nothing to decode/sample/resample — drop them
    // here so no downstream mapPartitions ever dereferences a null payload
    docs.filter(col(textCol).isNotNull).select(
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
      .mapPartitions(_.map { case (id, payload) => decodeFeatures(id, payload) })
      .toDF()
  }

  /** One sampled "frame" of a media payload. */
  case class Frame(doc_id: Long, frame_no: Long, frame_hash: String)

  /** Frame sampling over binary payloads — the video/audio access pattern:
    * slice the payload into fixed-size frames, keep every `strideBytes`-th
    * one, fingerprint each (STUB: md5 of the frame's lowercase hex; a real
    * decoder would emit pixels/PCM here). Runs iterator-to-iterator per
    * partition: one task walks its rows' payloads with zero shuffle — at
    * 100 TB the only data movement is the parquet scan itself, and frames
    * explode row counts by len/stride, so sampling happens BEFORE any
    * downstream shuffle.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 16, strideBytes: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, payload) =>
          Iterator.from(0)
            .takeWhile(j => j.toLong * strideBytes < payload.length)
            .map { j =>
              val start = j * strideBytes
              val frame = payload.slice(start, math.min(start + frameBytes, payload.length))
              val hex = toHex(frame)
              md.reset()
              val digest = toHex(md.digest(hex.getBytes("UTF-8")))
              Frame(id, j.toLong, digest)
            }
        }
      }
      .toDF()
  }

  /** Shared-frame linkage — which payloads contain the SAME frames:
    * the copied-segment detector for video/audio (a clip reused across
    * uploads shares its frame fingerprints even when the containers
    * differ). Frames come from `sampleFrames`; fingerprints with
    * document frequency in [2, maxDf] join doc-pairs (ultra-common
    * frames are boilerplate — silence/black — and are EXCLUDED, which
    * also caps the self-join fan-out per fingerprint at maxDf², the
    * dd2-style df bound that keeps the join skew-safe at corpus scale).
    * Returns (id1, id2, n_shared ≥ minShared), id1 < id2.
    */
  def sharedFramePairs(spark: SparkSession, media: DataFrame,
                       minShared: Int = 2, maxDf: Int = 20,
                       frameBytes: Int = 16, strideBytes: Int = 64): DataFrame = {
    val d = sampleFrames(spark, media, frameBytes, strideBytes)
      .select(col("doc_id"), col("frame_hash").as("fh")).distinct()
    val df = d.groupBy("fh").agg(count(lit(1)).as("c"))
      .where(col("c").between(2, maxDf))
    val keep = d.join(df.select("fh"), "fh")
    keep.as("x").join(keep.as("y"),
        col("x.fh") === col("y.fh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** One resampled payload. */
  case class Resampled(doc_id: Long, orig_len: Long, new_len: Long, res_digest: String)

  /** Resize/resample over binary payloads — the image-thumbnail/audio-
    * downsample access pattern. IMAGE payloads (magic-detected, decoded
    * via [[ImageDecode]]) take the REAL scaler: exact integer area-average
    * downsample of the decoded luma plane by `stride` in both dimensions
    * (output `ceil(W/stride) × ceil(H/stride)`), `orig_len`/`new_len` in
    * decoded SAMPLES, fingerprint = md5 of the thumbnail's lowercase hex.
    * Non-image payloads keep the strided-byte contract (every `stride`-th
    * byte, lengths in bytes) — that is also what the mm3 oracle replays
    * over text payloads. Iterator-to-iterator per partition, zero shuffle;
    * empty payloads are dropped (nothing to resample).
    */
  def resample(spark: SparkSession, media: DataFrame, stride: Int = 4): DataFrame = {
    import spark.implicits._
    require(stride >= 1)
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.filter(_._2.nonEmpty).map { case (id, payload) =>
          ImageDecode.decodeGray(payload) match {
            case Some(g) =>
              val w2 = (g.width + stride - 1) / stride
              val h2 = (g.height + stride - 1) / stride
              // cell (r,c) covers the exact integer grid — same arithmetic
              // as ImageDecode.downsample, target dims derived from stride
              val thumb = ImageDecode.downsample(g, w2, h2).get
              val out = new Array[Byte](thumb.length)
              var i = 0
              while (i < out.length) { out(i) = thumb(i).toByte; i += 1 }
              md.reset()
              Resampled(id, g.width.toLong * g.height, thumb.length.toLong,
                toHex(md.digest(toHex(out).getBytes("UTF-8"))))
            case None =>
              val n = (payload.length + stride - 1) / stride
              val out = new Array[Byte](n)
              var i = 0
              while (i < n) { out(i) = payload(i * stride); i += 1 }
              md.reset()
              Resampled(id, payload.length.toLong, n.toLong,
                toHex(md.digest(toHex(out).getBytes("UTF-8"))))
          }
        }
      }
      .toDF()
  }

  /** One energy window of a media payload. */
  case class EnergyWindow(doc_id: Long, win: Long, n_bytes: Long, energy: Long)

  /** Windowed byte-energy over binary payloads — the audio VAD/silence-
    * detection access pattern: consecutive `window`-byte spans reduced to
    * their unsigned-byte sum ("energy"). Like the other mm ops this is
    * the batch plumbing around a STUB signal decoder (the real pipeline
    * would decode samples first); the Spark shape — typed mapPartitions,
    * zero shuffles, one row per (payload, window) — is the real thing.
    */
  /** Per-payload nibble statistics. */
  case class NibbleStats(
      doc_id: Long,
      n_nibbles: Long,
      distinct_nibbles: Long,
      chi2: Long,
      concentration_ppm: Long)

  /** Byte-distribution uniformity screen over the binary column — the
    * ingest-time corruption/encoding check a media pipeline runs BEFORE
    * decode: well-formed compressed media (JPEG/MP3/MP4 payloads) has
    * near-uniform nibbles (low chi2), while text-in-disguise, zero
    * padding or truncated garbage is heavily skewed (high chi2 /
    * concentration). All statistics are EXACT Int64 — the uniformity
    * statistic is Σ(16·c − n)² over the 16 nibble counts (the Pearson
    * χ² numerator scaled by 16²·n, no division, no transcendental) and
    * concentration is 1e6·max(c) div n — so the hex-parsing SQL oracle
    * matches bit-for-bit. Zero shuffles: one typed mapPartitions batch
    * pass, the mm-family plumbing shape. */
  def byteStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2.nonEmpty).map { case (id, payload) =>
          val cnt = new Array[Long](16)
          var i = 0
          while (i < payload.length) {
            val v = payload(i) & 0xff
            cnt(v >> 4) += 1
            cnt(v & 0xf) += 1
            i += 1
          }
          val n = payload.length.toLong * 2
          var chi2 = 0L
          var distinct = 0L
          var maxC = 0L
          var j = 0
          while (j < 16) {
            val d = 16L * cnt(j) - n
            chi2 += d * d
            if (cnt(j) > 0) distinct += 1
            if (cnt(j) > maxC) maxC = cnt(j)
            j += 1
          }
          NibbleStats(id, n, distinct, chi2, 1000000L * maxC / n)
        }
      }
      .toDF()
  }

  def windowEnergy(spark: SparkSession, media: DataFrame, window: Int = 32): DataFrame = {
    import spark.implicits._
    require(window >= 1)
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2.nonEmpty).flatMap { case (id, payload) =>
          val nWin = (payload.length + window - 1) / window
          (0 until nWin).iterator.map { j =>
            val lo = j * window
            val hi = math.min(lo + window, payload.length)
            var e = 0L
            var i = lo
            while (i < hi) { e += payload(i) & 0xff; i += 1 }
            EnergyWindow(id, j.toLong, (hi - lo).toLong, e)
          }
        }
      }
      .toDF()
  }

  /** 64-bit dHash perceptual hash of a media payload, as a 64-char
    * '0'/'1' bit string. IMAGE payloads are REALLY decoded
    * ([[ImageDecode]]): javax.imageio decode → integer Rec.601 grayscale
    * → exact area-average 9×8 luma grid → bit (r,c) = luma(r,c) >
    * luma(r,c+1). Two re-encodings of the same picture (JPEG q90 vs q50,
    * JPEG vs PNG) land within small hamming distance and share LSH bands
    * (OpsSpec pins this). Non-image payloads keep the deterministic
    * byte-stub grid ("luma" of cell i = md5(md5hex(payload-hex) || ':'
    * || i), hash order standing in for brightness) — the contract mm6's
    * oracle replays over text payloads.
    *
    * Runs as the native `TextExprs.PHash64` expression: one payload
    * hex+digest pass, then 72 constant-length cell digests in a tight
    * reused-MessageDigest loop. The hex hop (not base64, not raw bytes)
    * is the portable byte spelling — Spark's base64 is MIME-chunked,
    * DuckDB's isn't (the mm2/mm5 precedent); the declarative
    * md5-over-hex twin is what the oracle computes, and TextExprsSpec
    * asserts the two are bit-equal.
    */
  def phash64(payload: Column): Column =
    graft.functions.TextExprs.phash64_bits(payload)

  /** Perceptual near-duplicate pairs via banded LSH over `phash64`: each
    * hash emits 4 bands of 16 bits; docs sharing any band key become
    * candidates (expected collisions for unrelated docs ≈ n²·4/2¹⁶ —
    * bounded, never all-pairs); candidates are verified by exact hamming
    * distance ≤ `maxHamming`. The image/video twin of MinHash-LSH text
    * dedup: same band-bucket-join shape, so the same skew/scale
    * properties hold at 100 TB (bucket fan-out is capped by near-dup
    * cluster size, not corpus size). Guarantee: 4 bands of 16 bits find
    * every pair with hamming ≤ 3 (pigeonhole — the Manku et al.
    * production simhash configuration); 4..maxHamming is probabilistic.
    * Random-pair collisions are n²·4/2¹⁶ — widen/cascade the bands as
    * the corpus grows. Returns (id1, id2, hamming), id1 < id2.
    */
  def phashNearDupPairs(media: DataFrame, maxHamming: Int = 6): DataFrame = {
    // the repartition is a MATERIALIZATION BARRIER: both self-join
    // branches REUSE the one exchange (ReusedExchange), so each payload
    // is hashed and scanned once — measured faster than recomputing the
    // (native, already cheap) hash per branch, and at 100 TB it halves
    // the media-table scans
    // bit-pack the 64-char hash into two 32-bit halves next to it: the
    // hamming verify then runs as codegen'd bit_count(xor) instead of an
    // interpreted 64-element lambda over substrings (measured 17.6 s →
    // ~0.2 s for 310k candidate pairs). Two halves, not one long —
    // conv() of a high-bit-set 64-bit string overflows BIGINT to null.
    def half(off: Int) = expr(s"cast(conv(substring(phash, $off, 32), 2, 10) as bigint)")
    val ph = media.select(col("doc_id"), phash64(col("payload")).as("phash"))
      .withColumn("ph_hi", half(1))
      .withColumn("ph_lo", half(33))
      .repartition(col("doc_id"))
    val bands = ph
      .select(col("doc_id"), col("ph_hi"), col("ph_lo"),
        explode(sequence(lit(0), lit(3))).as("bi"), col("phash"))
      .select(col("doc_id"), col("ph_hi"), col("ph_lo"), col("bi"),
        expr("substring(phash, bi * 16 + 1, 16)").as("bk"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bi") === col("y.bi") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
        col("x.ph_hi").as("h1"), col("x.ph_lo").as("l1"),
        col("y.ph_hi").as("h2"), col("y.ph_lo").as("l2"))
      .distinct()
    cand
      .withColumn("hamming",
        expr("cast(bit_count(h1 ^ h2) + bit_count(l1 ^ l2) as bigint)"))
      .where(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
