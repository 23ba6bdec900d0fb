package graft.multimodal

/** From-scratch PNG baseline codec (round-6 verdict #5: make q20's
  * multimodal column REAL — the only missing primitive was a decoder, and
  * PNG's compression is the same zlib `Inflater` the PDF stack's
  * FlateDecode already uses; no codec jars needed).
  *
  * Decoder scope (everything else returns None, never throws):
  *   - bit depth 8, interlace 0 (non-Adam7), compression 0, filter
  *     method 0 — the overwhelmingly common baseline profile;
  *   - color types 0 (gray), 2 (RGB), 3 (palette, expanded to RGB),
  *     4 (gray+alpha), 6 (RGBA);
  *   - per-chunk CRC32 verification (java.util.zip.CRC32);
  *   - all five scanline filters (None/Sub/Up/Average/Paeth);
  *   - a decompression-bomb guard: decoded pixel bytes are capped
  *     (default 64 MiB) BEFORE inflation, from header fields alone.
  *
  * The encoder exists for deterministic test/corpus generation: it writes
  * the same baseline profile, optionally cycling the filter type per row
  * so round-trip tests exercise every unfilter path.
  *
  * PNG spec: https://www.w3.org/TR/png-3/ (public). Format constants
  * (signature, chunk layout, filter algebra) are from the spec, not any
  * existing codec's source.
  */
object Png {

  final case class Decoded(
      width: Int,
      height: Int,
      channels: Int, // AFTER palette expansion: 1, 2, 3 or 4
      pixels: Array[Byte]) // row-major, width*height*channels bytes

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Raw channel count per color type (pre palette expansion); -1 for
    * color types this baseline decoder does not accept. */
  private def rawChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // gray
    case 2 => 3 // rgb
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // rgba
    case _ => -1
  }

  /** Paeth predictor (PNG spec §9.4): nearest of a/b/c to a+b-c with the
    * spec's tie order a, b, c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode `bytes` as a baseline PNG. None on ANY structural problem —
    * bad signature, unsupported profile, CRC mismatch, truncated or
    * oversized IDAT, palette index out of range. Never throws (the
    * extractor's never-throw contract). */
  def decode(bytes: Array[Byte], maxPixelBytes: Long = 64L << 20): Option[Decoded] =
    try decodeInner(bytes, maxPixelBytes)
    catch { case _: Throwable => None }

  private def decodeInner(bytes: Array[Byte], maxPixelBytes: Long): Option[Decoded] = {
    if (bytes == null || bytes.length < Signature.length + 25) return None
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return None
      i += 1
    }
    var off = Signature.length
    var width, height, bitDepth, colorType, interlace = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var seenIhdr = false
    var seenIend = false
    val crc = new java.util.zip.CRC32()
    while (!seenIend) {
      if (off + 12 > bytes.length) return None // truncated chunk header
      val len = be32(bytes, off)
      if (len > Int.MaxValue - 12 || off + 12 + len > bytes.length) return None
      val dataOff = off + 8
      crc.reset()
      crc.update(bytes, off + 4, 4 + len.toInt) // type + data
      if (crc.getValue != be32(bytes, dataOff + len.toInt)) return None
      val ctype = new String(bytes, off + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          // IHDR must be the FIRST chunk (spec §11.2.1)
          if (seenIhdr || off != Signature.length || len != 13) return None
          seenIhdr = true
          width = be32(bytes, dataOff).toInt
          height = be32(bytes, dataOff + 4).toInt
          bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          val compression = bytes(dataOff + 10) & 0xff
          val filterMethod = bytes(dataOff + 11) & 0xff
          interlace = bytes(dataOff + 12) & 0xff
          if (width <= 0 || height <= 0 || bitDepth != 8 ||
            rawChannels(colorType) < 0 || compression != 0 ||
            filterMethod != 0 || interlace != 0) return None
        case "PLTE" =>
          if (!seenIhdr || len % 3 != 0 || len == 0 || len > 768) return None
          palette = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len.toInt)
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, dataOff, len.toInt)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks (tEXt, gAMA, ...) are skipped
      }
      off = dataOff + len.toInt + 4
    }
    if (!seenIhdr) return None
    val rawCh = rawChannels(colorType)
    if (colorType == 3 && palette == null) return None
    val outCh = if (colorType == 3) 3 else rawCh
    // bomb guard BEFORE inflating: the decoded size is fully determined
    // by header fields, so a 1 KB bomb claiming 1 GB dies here
    if (width.toLong * height * outCh > maxPixelBytes) return None
    val rowBytes = width.toLong * rawCh
    val rawLen = (height.toLong * (rowBytes + 1)).toInt
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, got, rawLen - got)
        // ANY zero-progress iteration is a failure, not just needsInput
        // (round-7 ADVICE): output space is always > 0 inside this loop,
        // so n == 0 without finished() means the stream is truncated OR
        // stalled — e.g. a zlib header with the FDICT preset-dictionary
        // flag makes inflate() return 0 with needsInput() false forever,
        // which spun this loop into an executor-task hang on adversarial
        // crawl bytes (never-throw/never-hang contract)
        if (n == 0) return None
        got += n
      }
      if (got != rawLen) return None
      // a conforming stream ends exactly here; trailing pixels would mean
      // the header lied about the dims
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return None
    } finally inf.end()
    // unfilter in place into the output layout
    val bpp = rawCh
    val stride = rowBytes.toInt
    val flat = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      if (filter > 4) return None
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val a = if (x >= bpp) flat(dst + x - bpp) & 0xff else 0
        val b = if (y > 0) flat(dst - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) flat(dst - stride + x - bpp) & 0xff else 0
        val v = raw(src + x) & 0xff
        val out = filter match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + ((a + b) >> 1)
          case 4 => v + paeth(a, b, c)
        }
        flat(dst + x) = out.toByte
        x += 1
      }
      y += 1
    }
    if (colorType == 3) {
      // palette expansion to RGB
      val nEntries = palette.length / 3
      val px = new Array[Byte](width * height * 3)
      var k = 0
      while (k < flat.length) {
        val idx = flat(k) & 0xff
        if (idx >= nEntries) return None
        px(3 * k) = palette(3 * idx)
        px(3 * k + 1) = palette(3 * idx + 1)
        px(3 * k + 2) = palette(3 * idx + 2)
        k += 1
      }
      Some(Decoded(width, height, 3, px))
    } else Some(Decoded(width, height, rawCh, flat))
  }

  // ---- encoder (deterministic test/corpus generation) ------------------

  private def chunk(out: java.io.ByteArrayOutputStream, ctype: String, data: Array[Byte]): Unit = {
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt)
      out.write((v & 0xff).toInt)
    }
    w32(data.length.toLong)
    val t = ctype.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(t)
    crc.update(data)
    w32(crc.getValue)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    try {
      d.setInput(raw)
      d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Apply filter `f` to row `y` (the encoder-side transform the decoder
    * inverts). */
  private def filterRow(flat: Array[Byte], y: Int, stride: Int, bpp: Int, f: Int): Array[Byte] = {
    val row = new Array[Byte](stride + 1)
    row(0) = f.toByte
    val dst = y * stride
    var x = 0
    while (x < stride) {
      val v = flat(dst + x) & 0xff
      val a = if (x >= bpp) flat(dst + x - bpp) & 0xff else 0
      val b = if (y > 0) flat(dst - stride + x) & 0xff else 0
      val c = if (x >= bpp && y > 0) flat(dst - stride + x - bpp) & 0xff else 0
      val enc = f match {
        case 0 => v
        case 1 => v - a
        case 2 => v - b
        case 3 => v - ((a + b) >> 1)
        case 4 => v - paeth(a, b, c)
      }
      row(x + 1) = enc.toByte
      x += 1
    }
    row
  }

  /** Encode a baseline PNG. `channels` 1/2/3/4 -> color type 0/4/2/6.
    * `filterType` 0-4 fixes one filter; -1 cycles row%5 so a round-trip
    * test exercises every unfilter path. */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      filterType: Int = -1): Array[Byte] = {
    require(pixels.length == width * height * channels, "pixel buffer size")
    val colorType = channels match {
      case 1 => 0
      case 2 => 4
      case 3 => 2
      case 4 => 6
      case _ => throw new IllegalArgumentException(s"channels $channels")
    }
    encodeWith(width, height, colorType, channels, pixels, None, filterType)
  }

  /** Encode a palette (color type 3) PNG from RGB triplets + index rows. */
  def encodePalette(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte], filterType: Int = -1): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length <= 768, "palette size")
    require(indices.length == width * height, "index buffer size")
    encodeWith(width, height, 3, 1, indices, Some(palette), filterType)
  }

  private def encodeWith(width: Int, height: Int, colorType: Int, rawCh: Int,
      flat: Array[Byte], palette: Option[Array[Byte]], filterType: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    def p32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xff).toByte
      ihdr(off + 1) = ((v >> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >> 8) & 0xff).toByte
      ihdr(off + 3) = (v & 0xff).toByte
    }
    p32(0, width)
    p32(4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression 0, filter 0, interlace 0 already zero
    chunk(out, "IHDR", ihdr)
    palette.foreach(p => chunk(out, "PLTE", p))
    val stride = width * rawCh
    val raw = new java.io.ByteArrayOutputStream()
    var y = 0
    while (y < height) {
      val f = if (filterType >= 0) filterType % 5 else y % 5
      val row = filterRow(flat, y, stride, rawCh, f)
      raw.write(row, 0, row.length)
      y += 1
    }
    chunk(out, "IDAT", deflate(raw.toByteArray))
    chunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }
}
