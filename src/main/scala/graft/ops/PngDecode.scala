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
  * Scope (r16 completed): ALL five colour types — greyscale (0),
  * truecolour (2), palette (3, PLTE expansion), grey+alpha (4) and
  * RGBA (6) — at EVERY legal bit depth (§11.2.2's table: grey
  * 1/2/4/8/16, palette 1/2/4/8, the rest 8/16), in BOTH scanline
  * orders: sequential and Adam7 INTERLACED (§8.2: seven passes, each
  * an independently-filtered sub-image scattered onto the 8×8 grid),
  * plus tRNS transparency in all three forms (§11.3.2: palette-alpha
  * table for type 3 → RGBA expansion; grey/RGB colour-key for types
  * 0/2 → an added alpha plane). Nothing in the PNG population rejects
  * now except genuinely illegal streams (bad CRC, truncation, illegal
  * depth/type combinations — never a silent wrong answer). Lossless ⇒
  * exact oracles: the registered rows hash the decoded raster's mean
  * against the pre-encode closed form with NO tolerance band, and
  * PngSpec pins per-pixel equality against BOTH the closed form and
  * ImageIO's independent decode (incl. interlaced, paletted, 4-bit
  * and tRNS-paletted streams ImageIO itself wrote), plus
  * CRC-flip/truncation rejection.
  *
  * Cost: O(pixels), O(scanline) state past the inflate buffer; runs in
  * the same batched mapPartitions codec slot as every decoder.
  */
object PngDecode {

  /** channels = 1 (grey), 2 (grey+alpha — native type 4 OR type 0 with
    * a tRNS colour-key), 3 (RGB — truecolour or palette-expanded) or
    * 4 (RGBA — native type 6, tRNS-paletted type 3, or type 2 with a
    * tRNS colour-key); row-major interleaved samples. `depth` is the
    * source bit depth: samples range 0..(2^depth − 1); palette-
    * expanded output is always 8-bit regardless of the index depth.
    */
  final case class Decoded(width: Int, height: Int, channels: Int,
      samples: Array[Int], depth: Int = 8)

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
    var colourType = 0
    var depth = 8
    var interlaced = false
    var palette: Array[Int] = null
    var trnsPalette: Array[Int] = null // type 3: per-index alpha table
    var trnsGrey = -1                  // type 0: fully-transparent grey key
    var trnsRgb: Array[Int] = null     // type 2: fully-transparent RGB key
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
          depth = u8(pos + 16)
          colourType = u8(pos + 17)
          interlaced = u8(pos + 20) == 1
          // §11.2.2's legal depth/type table: grey 1/2/4/8/16,
          // palette 1/2/4/8, truecolour + alpha-bearing types 8/16
          val legalDepths: Set[Int] = colourType match {
            case 0 => Set(1, 2, 4, 8, 16)
            case 3 => Set(1, 2, 4, 8)
            case 2 | 4 | 6 => Set(8, 16)
            case t => throw new IllegalArgumentException(
              s"png: colour type $t unknown")
          }
          if (!legalDepths(depth)) throw new IllegalArgumentException(
            s"png: depth $depth illegal for colour type $colourType")
          channels = colourType match {
            case 0 => 1
            case 2 => 3
            case 3 => 1 // palette index plane; expanded to RGB below
            case 4 => 2
            case 6 => 4
          }
          if (u8(pos + 20) > 1) throw new IllegalArgumentException(
            s"png: interlace method ${u8(pos + 20)} unknown")
          require(width > 0 && height > 0, "png: empty image")
          sawIhdr = true
        case "PLTE" =>
          require(sawIhdr, "png: PLTE before IHDR")
          require(len % 3 == 0 && len <= 256 * 3, s"png: PLTE length $len")
          palette = Array.tabulate(len.toInt)(i => u8(pos + 8 + i))
        case "tRNS" => // §11.3.2: three forms keyed by colour type
          require(sawIhdr, "png: tRNS before IHDR")
          colourType match {
            case 3 =>
              require(palette != null, "png: tRNS before PLTE")
              require(len <= palette.length / 3,
                s"png: tRNS length $len exceeds PLTE entries")
              trnsPalette = Array.tabulate(len.toInt)(i => u8(pos + 8 + i))
            case 0 =>
              require(len == 2, s"png: grey tRNS length $len")
              trnsGrey = (u8(pos + 8) << 8) | u8(pos + 9)
            case 2 =>
              require(len == 6, s"png: RGB tRNS length $len")
              trnsRgb = Array(
                (u8(pos + 8) << 8) | u8(pos + 9),
                (u8(pos + 10) << 8) | u8(pos + 11),
                (u8(pos + 12) << 8) | u8(pos + 13))
            case t => throw new IllegalArgumentException(
              s"png: tRNS illegal for alpha-bearing colour type $t")
          }
        case "IDAT" =>
          require(sawIhdr, "png: IDAT before IHDR")
          idat.write(bytes, pos + 8, len.toInt)
        case "IEND" => sawIend = true
        case _ => // ancillary (tEXt, pHYs, …): CRC-checked then skipped
      }
      pos += 12 + len.toInt
    }
    require(sawIhdr, "png: no IHDR")
    if (colourType == 3) require(palette != null, "png: palette image without PLTE")

    // §8.2 pass geometry: sequential = one full pass; Adam7 = seven
    // sub-images, each with its own scanline filtering, scattered
    // onto the (x0 + px·dx, y0 + py·dy) grid
    val passes: Seq[(Int, Int, Int, Int)] =
      if (!interlaced) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (math.max(0, (width - x0 + dx - 1) / dx),
        math.max(0, (height - y0 + dy - 1) / dy))
    }
    // filter unit (§6): bytes per pixel ROUNDED UP TO ONE — the filter
    // algebra is byte-wise at EVERY depth: 16-bit rows reconstruct as
    // byte streams and combine big-endian pairs afterwards; sub-8-bit
    // rows (1/2/4-bit grey or palette indices) filter with bpp = 1 and
    // unpack big-endian-within-byte afterwards (§7.2: leftmost pixel
    // in the high-order bits).
    val bitsPP = channels * depth
    val fbpp = math.max(1, bitsPP / 8)
    def rowBytes(pw: Int): Int = (pw * bitsPP + 7) / 8
    val rawLen = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0 else (rowBytes(pw) + 1) * ph
    }.sum

    // zlib-inflate the concatenated IDAT payload to raw scanlines
    val raw = new Array[Byte](rawLen)
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

    // §6 filter reconstruction per pass, then per-pixel SAMPLE
    // extraction (byte, byte pair, or bitfield by depth) scattered
    // into the full sample grid
    val samplesOut = new Array[Int](width * height * channels)
    var passOff = 0
    passes.foreach { case p @ (x0, y0, dx, dy) =>
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) {
        val stride = rowBytes(pw)
        val sub = new Array[Int](stride * ph)
        var y = 0
        while (y < ph) {
          val rowOff = passOff + y * (stride + 1)
          val filter = raw(rowOff) & 0xff
          var x = 0
          while (x < stride) {
            val cur = raw(rowOff + 1 + x) & 0xff
            val left = if (x >= fbpp) sub(y * stride + x - fbpp) else 0
            val up = if (y > 0) sub((y - 1) * stride + x) else 0
            val ul = if (y > 0 && x >= fbpp) sub((y - 1) * stride + x - fbpp) else 0
            val recon = filter match {
              case 0 => cur
              case 1 => cur + left
              case 2 => cur + up
              case 3 => cur + (left + up) / 2
              case 4 => // Paeth (spec pseudocode)
                val pp = left + up - ul
                val pa = math.abs(pp - left)
                val pb = math.abs(pp - up)
                val pc = math.abs(pp - ul)
                cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
              case f => throw new IllegalArgumentException(s"png: filter type $f")
            }
            sub(y * stride + x) = recon & 0xff
            x += 1
          }
          y += 1
        }
        // extract samples and scatter the pass onto the full raster
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            var c = 0
            while (c < channels) {
              val s =
                if (depth == 16) {
                  val o = py * stride + (px * channels + c) * 2
                  (sub(o) << 8) | sub(o + 1) // big-endian pairs (§7.1)
                } else if (depth == 8) {
                  sub(py * stride + px * channels + c)
                } else { // 1/2/4-bit: channels == 1, leftmost-pixel-high
                  val bit = px * depth
                  (sub(py * stride + (bit >> 3)) >> (8 - depth - (bit & 7))) &
                    ((1 << depth) - 1)
                }
              samplesOut(((y0 + py * dy) * width + (x0 + px * dx)) * channels + c) = s
              c += 1
            }
            px += 1
          }
          py += 1
        }
        passOff += (stride + 1) * ph
      }
    }

    val maxVal = (1 << depth) - 1
    if (colourType == 3) {
      // palette expansion: index plane → interleaved RGB(A) — alpha
      // only when a tRNS table is present (§11.3.2: indices past the
      // table's end are opaque)
      val ch = if (trnsPalette != null) 4 else 3
      val rgb = new Array[Int](width * height * ch)
      var i = 0
      while (i < width * height) {
        val idx = samplesOut(i)
        if (3 * idx + 2 >= palette.length)
          throw new IllegalArgumentException(
            s"png: palette index $idx beyond PLTE (${palette.length / 3} entries)")
        rgb(ch * i) = palette(3 * idx)
        rgb(ch * i + 1) = palette(3 * idx + 1)
        rgb(ch * i + 2) = palette(3 * idx + 2)
        if (ch == 4)
          rgb(ch * i + 3) =
            if (idx < trnsPalette.length) trnsPalette(idx) else 255
        i += 1
      }
      Decoded(width, height, ch, rgb)
    } else if (colourType == 0 && trnsGrey >= 0) {
      // grey colour-key transparency → grey+alpha plane
      val ga = new Array[Int](width * height * 2)
      var i = 0
      while (i < width * height) {
        val g = samplesOut(i)
        ga(2 * i) = g
        ga(2 * i + 1) = if (g == trnsGrey) 0 else maxVal
        i += 1
      }
      Decoded(width, height, 2, ga, depth)
    } else if (colourType == 2 && trnsRgb != null) {
      // RGB colour-key transparency → RGBA
      val rgba = new Array[Int](width * height * 4)
      var i = 0
      while (i < width * height) {
        val o = 3 * i
        val (r, g, b) = (samplesOut(o), samplesOut(o + 1), samplesOut(o + 2))
        rgba(4 * i) = r; rgba(4 * i + 1) = g; rgba(4 * i + 2) = b
        rgba(4 * i + 3) =
          if (r == trnsRgb(0) && g == trnsRgb(1) && b == trnsRgb(2)) 0 else maxVal
        i += 1
      }
      Decoded(width, height, 4, rgba, depth)
    } else Decoded(width, height, channels, samplesOut, depth)
  }

  def meanSample(d: Decoded): Double = {
    var s = 0L
    var i = 0
    while (i < d.samples.length) { s += d.samples(i); i += 1 }
    s.toDouble / d.samples.length
  }
}
