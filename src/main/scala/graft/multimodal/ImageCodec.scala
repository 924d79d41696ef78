package graft.multimodal

/** A REAL pure-JVM image codec for the [[Multimodal.Codec]] swap point —
  * binary PPM (P6) and uncompressed 24-bit BMP, the two raster formats
  * parseable without any image library (this container ships none). The
  * reference treats media payloads as opaque device buffers; this is our
  * added LLM-pipeline surface (SURVEY §2.9), so the format choice is ours.
  *
  * `grayEmbedding(grid)` satisfies the codec contract exactly as
  * `MultimodalSuite` states it: fixed output dim (grid²) for EVERY payload
  * — undecodable or empty bytes yield the zero vector — row-local,
  * deterministic, serializable. Decode → luma → nearest-neighbor resample
  * to a grid×grid patch stands where a model forward pass would run; the
  * decoded-pixel plumbing (header parse, bottom-up rows, stride padding)
  * is the real thing.
  */
object ImageCodec {

  /** Decoded raster: row-major top-down RGB triples, 3 bytes per pixel. */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Dispatch on magic bytes; None for anything undecodable. */
  def decode(bytes: Array[Byte]): Option[Image] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else None

  // ===== PPM (P6) ========================================================
  // header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw RGB;
  // '#' starts a comment through end-of-line anywhere in the header
  private def decodePpm(b: Array[Byte]): Option[Image] = {
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else go = false
      }
    }
    def token(): Long = {
      skipWs()
      var v = -1L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val (w, h, maxval) = (token(), token(), token())
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 || i >= b.length) return None
    i += 1 // the single whitespace byte after maxval
    // size math in Long: a crafted "P6 100000 100000" header must fail the
    // bounds check, not overflow Int and crash the copy — decode() maps
    // every malformed payload to None (the zero-vector contract)
    val need = w * h * 3L
    if (need > b.length - i) return None
    Some(Image(w.toInt, h.toInt,
      java.util.Arrays.copyOfRange(b, i, i + need.toInt)))
  }

  /** Encode as binary PPM — the writer half of the roundtrip (and a usable
    * sink for decoded frames). */
  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  // ===== BMP (BITMAPINFOHEADER, 24bpp, BI_RGB) ===========================
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def decodeBmp(b: Array[Byte]): Option[Image] = {
    if (b.length < 54) return None
    val pixelOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER etc. unsupported
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue || bpp != 24 ||
      compression != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    // stride/size math in Long: a width like 0x40000000 must fail bounds,
    // not overflow Int into a negative allocation
    val strideL = ((w * 3L + 3) / 4) * 4 // rows padded to 4-byte boundaries
    if (pixelOff < 0 || b.length - pixelOff < strideL * h ||
      w * 3L * h > Int.MaxValue) return None
    val stride = strideL.toInt // <= b.length after the bounds check
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      // BMP stores rows bottom-up unless height is negative; pixels as BGR
      val srcRow = pixelOff + (if (topDown) y else h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, rgb))
  }

  /** Encode as bottom-up 24bpp BI_RGB BMP. */
  def encodeBmp(img: Image): Array[Byte] = {
    val stride = ((img.width * 3 + 3) / 4) * 4
    val pixelBytes = stride * img.height
    val out = new Array[Byte](54 + pixelBytes)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, out.length); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, img.width); putLe32(22, img.height)
    out(26) = 1; out(28) = 24
    putLe32(34, pixelBytes)
    var y = 0
    while (y < img.height) {
      val dstRow = 54 + (img.height - 1 - y) * stride
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = dstRow + x * 3
        out(d) = img.rgb(s + 2); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** The real-decoder instance of [[Multimodal.Codec]]: decode, convert to
    * BT.601 luma, nearest-neighbor resample to grid×grid, scale to [0, 1].
    * Undecodable/empty payloads map to the zero vector of the SAME dim —
    * the fixed-output-dim contract `MultimodalSuite` pins. */
  def grayEmbedding(grid: Int): Multimodal.Codec = { bytes: Array[Byte] =>
    decode(bytes) match {
      case None => new Array[Float](grid * grid)
      case Some(img) =>
        Array.tabulate(grid * grid) { i =>
          val (gy, gx) = (i / grid, i % grid)
          val x = math.min(img.width - 1, gx * img.width / grid)
          val y = math.min(img.height - 1, gy * img.height / grid)
          val p = (y * img.width + x) * 3
          val luma = 0.299 * (img.rgb(p) & 0xff) + 0.587 * (img.rgb(p + 1) & 0xff) +
            0.114 * (img.rgb(p + 2) & 0xff)
          (luma / 255.0).toFloat
        }
    }
  }
}
