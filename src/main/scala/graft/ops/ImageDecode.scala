package graft.ops

import java.io.ByteArrayInputStream

/** Real image decode for the multimodal family (JPEG/PNG/GIF/BMP via
  * javax.imageio, which ships with the JDK — no external codec deps).
  * Everything downstream of decode is EXACT integer arithmetic so results
  * are bit-reproducible across JVMs and partitionings:
  *
  *   - luma: integer Rec.601 `(77·R + 150·G + 29·B) >> 8` per pixel
  *   - downsample: area average over the exact integer pixel grid
  *     `[r·H/h, (r+1)·H/h) × [c·W/w, (c+1)·W/w)`, integer division
  *
  * Detection is by magic bytes (JPEG `FF D8 FF`, PNG 8-byte signature,
  * GIF `GIF8`, BMP `BM`) — all of which are invalid UTF-8 prefixes, so a
  * text payload can NEVER be misrouted into the decode path (that is what
  * keeps the mm-family oracles, which run over UTF-8 text payloads, exact:
  * the md5-stub fallback still handles every non-image payload).
  *
  * Scale guard: dimensions are read from the container header BEFORE the
  * pixel decode, and anything over `MaxPixels` (a decompression-bomb
  * guard: a 100-byte payload can declare a gigapixel canvas) falls back
  * to the byte-stub path instead of allocating the canvas on an executor.
  *
  * Reference behavior anchor: the reference treats media as opaque binary
  * columns and leaves decode to UDFs (seafowl: WASM UDFs over binary args,
  * src/wasm_udf/wasm.rs) — this module is the built-in decode those UDFs
  * would otherwise supply.
  */
object ImageDecode {

  /** Decoded grayscale image: row-major luma values in [0, 255], stored
    * as bytes (read with `& 0xff`) — one byte per pixel keeps the decode
    * footprint at W·H, not 4·W·H. */
  final case class Gray(width: Int, height: Int, luma: Array[Byte])

  /** Decompression-bomb guard: refuse canvases over 24M pixels (a 6000×
    * 4000 photo). Transient peak per decode ≈ the codec's raster plus a
    * one-row RGB buffer plus the W·H luma bytes — sized so the usual
    * 8–32 concurrent partition tasks per executor fit comfortably; a
    * 100-byte payload can DECLARE a gigapixel canvas, which the
    * header-first dimension read rejects before any allocation. */
  val MaxPixels: Long = 24L * 1024 * 1024

  /** Magic-byte sniff. All four signatures start with bytes that are
    * invalid as UTF-8 text prefixes or vanishingly unlikely in prose
    * ('BM'/'GIF8' are length-checked + full-signature checked). */
  def isImage(p: Array[Byte]): Boolean = {
    if (p == null || p.length < 8) return false
    // JPEG: FF D8 FF
    if ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff) return true
    // PNG: 89 50 4E 47 0D 0A 1A 0A
    if ((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
        (p(4) & 0xff) == 0x0d && (p(5) & 0xff) == 0x0a && (p(6) & 0xff) == 0x1a &&
        (p(7) & 0xff) == 0x0a) return true
    // GIF: "GIF87a" / "GIF89a"
    if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
        (p(4) == '7' || p(4) == '9') && p(5) == 'a') return true
    // BMP: "BM" + a known DIB header size at offset 14 — 'BM' alone is
    // plausible text ("BMW…"), the DIB size constant is not
    if (p(0) == 'B' && p(1) == 'M' && p.length >= 18) {
      val dib = (p(14) & 0xff) | ((p(15) & 0xff) << 8) | ((p(16) & 0xff) << 16) | ((p(17) & 0xff) << 24)
      if (dib == 12 || dib == 40 || dib == 52 || dib == 56 || dib == 64 || dib == 108 || dib == 124)
        return true
    }
    false
  }

  /** Decode payload to grayscale. None when: not an image by magic, the
    * codec rejects it, or the declared canvas exceeds MaxPixels. Callers
    * fall back to the byte-stub path on None — decode NEVER throws. */
  def decodeGray(payload: Array[Byte]): Option[Gray] = {
    if (!isImage(payload)) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          val img = reader.read(0)
          if (img == null) return None
          // row-wise RGB extraction: one reused W-int buffer instead of a
          // full 4·W·H int plane next to the luma bytes
          val luma = new Array[Byte](w * h)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            val base = y * w
            while (x < w) {
              val v = row(x)
              luma(base + x) =
                ((77 * ((v >> 16) & 0xff) + 150 * ((v >> 8) & 0xff) + 29 * (v & 0xff)) >> 8).toByte
              x += 1
            }
            y += 1
          }
          Some(Gray(w, h, luma))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Exact integer area-average downsample to a w×h grid. Requires the
    * source to be at least grid-sized (callers fall back to the stub for
    * sub-grid thumbnails — an 8×7 "image" has no 9×8 gradient grid). */
  def downsample(g: Gray, w: Int, h: Int): Option[Array[Int]] = {
    val W = g.width; val H = g.height
    if (W < w || H < h) return None
    val out = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      val y0 = (r.toLong * H / h).toInt
      val y1 = ((r + 1).toLong * H / h).toInt
      var c = 0
      while (c < w) {
        val x0 = (c.toLong * W / w).toInt
        val x1 = ((c + 1).toLong * W / w).toInt
        var sum = 0L
        var y = y0
        while (y < y1) {
          val base = y * W
          var x = x0
          while (x < x1) { sum += g.luma(base + x) & 0xff; x += 1 }
          y += 1
        }
        out(r * w + c) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        c += 1
      }
      r += 1
    }
    Some(out)
  }

  /** Real dHash over a decoded image: 9×8 area-average luma grid, bit
    * (r,c) = cell(r,c) > cell(r,c+1) — 64 bits as '0'/'1' bytes, the same
    * spelling as the stub path so banding/verify machinery is shared.
    * None when the payload isn't a decodable ≥9×8 image. */
  def dHashBits(payload: Array[Byte]): Option[Array[Byte]] =
    decodeGray(payload).flatMap(downsample(_, 9, 8)).map { cells =>
      val bits = new Array[Byte](64)
      var p = 0
      while (p < 64) {
        val li = (p / 8) * 9 + (p % 8)
        bits(p) = if (cells(li) > cells(li + 1)) '1' else '0'
        p += 1
      }
      bits
    }
}
