package graft.ops

/** PNG decoder (RFC 2083 / W3C PNG spec, from scratch): completes the
  * image-codec family — [[JpegDecode]] (lossy DCT) and [[GifDecode]]
  * (LZW palette) are from-scratch, but PNG — the format every image
  * row's PAYLOAD is stored in — was decoded through `javax.imageio`
  * only. This decoder makes the whole image path self-verified:
  * signature + chunk walk with CRC-32 verification on every chunk
  * (java.util.zip.CRC32, the same polynomial the spec mandates),
  * multi-IDAT zlib stream reassembly (Inflater — PNG's DEFLATE is
  * RFC 1950/1951), and full scanline filter reconstruction (§6:
  * None/Sub/Up/Average/Paeth, the Paeth predictor verbatim from the
  * spec's pseudocode).
  *
  * Scope: 8-bit greyscale (colour type 0) and 8-bit truecolour
  * (type 2), non-interlaced — exactly what [[MultimodalOps.MediaCodec]]
  * emits and the overwhelming web-crawl majority; palette/alpha/16-bit/
  * Adam7 reject loudly (never a silent wrong answer). Lossless ⇒ exact
  * oracles: the registered row hashes the decoded raster's mean against
  * the pre-encode closed form with NO tolerance band, and PngSpec pins
  * per-pixel equality against BOTH the closed form and ImageIO's
  * independent decode, plus CRC-flip/truncation rejection.
  *
  * Cost: O(pixels), O(scanline) state past the inflate buffer; runs in
  * the same batched mapPartitions codec slot as every decoder.
  */
object PngDecode {

  /** channels = 1 (grey) or 3 (RGB, row-major interleaved samples). */
  final case class Decoded(width: Int, height: Int, channels: Int,
      samples: Array[Int])

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == Signature(i)),
      "png: missing signature")
    def u8(i: Int): Int = {
      if (i >= bytes.length)
        throw new IllegalArgumentException("png: truncated stream")
      bytes(i) & 0xff
    }
    def u32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL

    var pos = 8
    var width = 0
    var height = 0
    var channels = 0
    var sawIhdr = false
    var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      val len = u32(pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length)
        throw new IllegalArgumentException(s"png: bad chunk length $len")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      // CRC-32 covers type + data (spec §5.3)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      if (crc.getValue != u32(pos + 8 + len.toInt))
        throw new IllegalArgumentException(s"png: CRC mismatch on $typ chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, s"png: IHDR length $len")
          width = u32(pos + 8).toInt
          height = u32(pos + 12).toInt
          val bitDepth = u8(pos + 16)
          val colourType = u8(pos + 17)
          val interlace = u8(pos + 20)
          if (bitDepth != 8) throw new IllegalArgumentException(
            s"png: only 8-bit depth in subset, got $bitDepth")
          channels = colourType match {
            case 0 => 1
            case 2 => 3
            case t => throw new IllegalArgumentException(
              s"png: colour type $t (palette/alpha) out of subset")
          }
          if (interlace != 0) throw new IllegalArgumentException(
            "png: Adam7 interlacing out of subset")
          require(width > 0 && height > 0, "png: empty image")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "png: IDAT before IHDR")
          idat.write(bytes, pos + 8, len.toInt)
        case "IEND" => sawIend = true
        case _ => // ancillary (tEXt, pHYs, …): CRC-checked then skipped
      }
      pos += 12 + len.toInt
    }
    require(sawIhdr, "png: no IHDR")

    // zlib-inflate the concatenated IDAT payload to raw scanlines
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException("png: truncated IDAT stream")
        got += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"png: corrupt DEFLATE: ${e.getMessage}")
    } finally inf.end()
    if (got != raw.length)
      throw new IllegalArgumentException(
        s"png: expected ${raw.length} raw bytes, inflated $got")

    // §6 filter reconstruction, one pass, bpp = channels at 8-bit
    val out = new Array[Int](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1)
      val filter = raw(rowOff) & 0xff
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + 1 + x) & 0xff
        val left = if (x >= bpp) out(y * stride + x - bpp) else 0
        val up = if (y > 0) out((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= bpp) out((y - 1) * stride + x - bpp) else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth (spec pseudocode)
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case f => throw new IllegalArgumentException(s"png: filter type $f")
        }
        out(y * stride + x) = recon & 0xff
        x += 1
      }
      y += 1
    }
    Decoded(width, height, channels, out)
  }

  def meanSample(d: Decoded): Double = {
    var s = 0L
    var i = 0
    while (i < d.samples.length) { s += d.samples(i); i += 1 }
    s.toDouble / d.samples.length
  }
}
