package graft

import org.apache.spark.sql.functions._

/** Seeded image-payload fuzz over the multimodal decode path — the one
  * surface the SELECT/DML fuzz layers never reach (they cannot generate
  * binary image containers). 200+ synthetic images (sizes 8..120,
  * flat/gradient/checker/noise patterns, PNG/BMP/GIF/JPEG containers,
  * seeded) flow through the REAL DataFrame surface — phash64,
  * extractFeatures, resample — and every payload is cross-checked
  * STRUCTURALLY against an independent recomputation:
  *
  *  - decodeGray dims = generated dims; extractFeatures digest = md5 of
  *    the decoded luma plane; resample byte_len = w·h and sample count =
  *    ceil(w/stride)·ceil(h/stride);
  *  - lossless containers (PNG vs BMP vs GIF of a ≤256-gray image) hash
  *    IDENTICALLY (decode is container-invariant);
  *  - high-quality JPEG re-encodes of smooth patterns stay within the
  *    LSH band contract (hamming ≤ 8) of their lossless twin;
  *  - forged decompression-bomb headers and UTF-8 text payloads take the
  *    guard/byte-stub paths without throwing.
  */
class ImageFuzzSpec extends SparkSpec {

  private def jpegBytes(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    // GIF: ImageIO quantizes RGB input to a fixed palette (NOT lossless);
    // a TYPE_BYTE_GRAY raster carries a 256-gray palette it preserves
    // exactly, and Rec.601 luma of (v,v,v) == gray sample v — so the
    // lossless-container-invariance contract genuinely holds
    val src = if (fmt == "gif") {
      val g = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      // raw sample copy — drawImage would colorspace-convert (gamma) and
      // shift the gray values
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        g.getRaster.setSample(x, y, 0, img.getRGB(x, y) & 0xff)
      g
    } else img
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, fmt, out)
    out.toByteArray
  }

  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  /** Seeded grayscale test image: pattern ∈ flat/gradient/checker/noise. */
  private def genImage(rnd: scala.util.Random, w: Int, h: Int,
                       pattern: String): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val base = rnd.nextInt(200)
    val cell = 8 + rnd.nextInt(9)
    val dx = rnd.nextInt(3) - 1
    val dy = rnd.nextInt(3) - 1
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = pattern match {
        case "flat" => base + 20
        case "gradient" => ((x * (dx + 2) + y * (dy + 2)) * 255) / math.max(1, (w + h) * 2)
        case "checker" => if (((x / cell) + (y / cell)) % 2 == 0) 40 else 215
        case _ => rnd.nextInt(256) // noise
      }
      val v = math.max(0, math.min(255, v0))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("200-payload seeded image fuzz: structural contracts hold on every payload") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val patterns = Seq("flat", "gradient", "checker", "noise")

    // (doc_id, payload, w, h, baseId, lossless?, jpegEligible?)
    case class P(id: Long, bytes: Array[Byte], w: Int, h: Int,
                 base: Int, lossless: Boolean, jpegTwin: Boolean)
    val payloads = scala.collection.mutable.ArrayBuffer.empty[P]
    var id = 0L
    for (base <- 0 until 80) {
      val pattern = patterns(base % patterns.length)
      val w = 8 + rnd.nextInt(113)
      val h = 8 + rnd.nextInt(113)
      val img = genImage(rnd, w, h, pattern)
      def add(bytes: Array[Byte], lossless: Boolean, jpegTwin: Boolean): Unit = {
        id += 1; payloads += P(id, bytes, w, h, base, lossless, jpegTwin)
      }
      add(encode(img, "png"), lossless = true, jpegTwin = false)
      add(encode(img, if (base % 2 == 0) "bmp" else "gif"), lossless = true, jpegTwin = false)
      // JPEG twin only where the band contract is guaranteed: smooth
      // patterns at ≥32px (tiny/noise images can exceed 8 bits under
      // lossy re-encode — they still run every structural check below)
      val smooth = pattern != "noise" && w >= 32 && h >= 32
      add(jpegBytes(img, 0.75f + rnd.nextFloat() * 0.2f), lossless = false, jpegTwin = smooth)
    }
    assert(payloads.size >= 200, s"payload count ${payloads.size}")

    val media = payloads.map(p => (p.id, p.bytes)).toSeq.toDF("doc_id", "payload")
    val stride = 7

    // one pass through each DataFrame surface
    val ph = media.select(col("doc_id"), ops.Multimodal.phash64(col("payload")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val feats = ops.Multimodal.extractFeatures(spark, media)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val rs = ops.Multimodal.resample(spark, media, stride = stride)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val md = java.security.MessageDigest.getInstance("MD5")
    var violations = List.empty[String]
    payloads.foreach { p =>
      val g = ops.ImageDecode.decodeGray(p.bytes)
      if (g.isEmpty) violations ::= s"doc ${p.id}: decode failed (base ${p.base})"
      else {
        val gg = g.get
        if ((gg.width, gg.height) != ((p.w, p.h)))
          violations ::= s"doc ${p.id}: dims ${gg.width}x${gg.height} != ${p.w}x${p.h}"
        // phash: 64-bit binary string
        if (!(ph(p.id).length == 64 && ph(p.id).forall(c => c == '0' || c == '1')))
          violations ::= s"doc ${p.id}: malformed phash ${ph(p.id).take(70)}"
        // features digest = md5 of decoded luma, byte_len = container size
        md.reset()
        val (bl, ck, dg) = feats(p.id)
        if (bl != p.bytes.length.toLong)
          violations ::= s"doc ${p.id}: byte_len $bl != ${p.bytes.length}"
        if (ck != gg.luma.take(4).map(v => (v & 0xff).toLong).sum)
          violations ::= s"doc ${p.id}: checksum4 mismatch"
        if (dg != ops.Multimodal.toHex(md.digest(gg.luma)))
          violations ::= s"doc ${p.id}: digest != md5(luma)"
        // resample: byte_len = w*h, samples = ceil(w/s)*ceil(h/s)
        val (rbl, rn) = rs(p.id)
        val expN = ((p.w + stride - 1) / stride).toLong * ((p.h + stride - 1) / stride)
        if (rbl != p.w.toLong * p.h || rn != expN)
          violations ::= s"doc ${p.id}: resample ($rbl,$rn) != (${p.w.toLong * p.h},$expN)"
      }
    }
    // container-invariance: lossless encodings of one base hash equal;
    // JPEG twins stay within the band contract. Applies only to images
    // at least the 9×8 dHash grid — smaller payloads take the byte-stub
    // hash, which is container-DEPENDENT by design (and still covered by
    // every structural check above).
    payloads.groupBy(_.base).filter { case (_, ps) =>
      ps.head.w >= 9 && ps.head.h >= 8
    }.foreach { case (base, ps) =>
      val lossless = ps.filter(_.lossless).toList
      lossless.zip(lossless.drop(1)).foreach { case (x, y) =>
        if (ph(x.id) != ph(y.id))
          violations ::= s"base $base: lossless containers hash differently " +
            s"(hamming ${hamming(ph(x.id), ph(y.id))})"
      }
      ps.filter(_.jpegTwin).foreach { j =>
        val twin = lossless.head
        val d = hamming(ph(j.id), ph(twin.id))
        if (d > 8) violations ::= s"base $base: jpeg twin hamming $d > 8"
      }
    }
    assert(violations.isEmpty,
      s"${violations.size} contract violations:\n${violations.take(10).mkString("\n")}")
  }

  test("fuzz edge payloads: bomb headers and text bytes never throw, never misroute") {
    import spark.implicits._
    val rnd = new scala.util.Random(7171)
    val img = genImage(rnd, 40, 40, "gradient")
    val png = encode(img, "png")
    // five forged-IHDR bombs with different absurd dims
    val bombs = (0 until 5).map { i =>
      val b = png.clone()
      val wBytes = java.nio.ByteBuffer.allocate(4).putInt(100000000 + i * 7919).array()
      System.arraycopy(wBytes, 0, b, 16, 4)
      (100L + i, b)
    }
    val texts = (0 until 5).map(i => (200L + i, s"text payload $i ${"x" * i}".getBytes("UTF-8")))
    val media = (bombs ++ texts).toDF("doc_id", "payload")
    bombs.foreach { case (_, b) => assert(ops.ImageDecode.decodeGray(b).isEmpty) }
    texts.foreach { case (_, t) => assert(ops.ImageDecode.decodeGray(t).isEmpty) }
    // the DataFrame surfaces all fall back to the byte contract, no throw
    val ph = media.select(col("doc_id"), ops.Multimodal.phash64(col("payload")).as("p")).collect()
    assert(ph.length === 10)
    val feats = ops.Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length === 10)
    texts.foreach { case (tid, t) =>
      val stub = ops.Multimodal.decodeStub(tid, t)
      val row = feats.find(_.getLong(0) == tid).get
      assert((row.getLong(1), row.getLong(2), row.getString(3)) ===
        ((stub.byte_len, stub.checksum4, stub.digest)))
    }
    val rs = ops.Multimodal.resample(spark, media, stride = 3).collect()
    assert(rs.length === 10)
  }
}
