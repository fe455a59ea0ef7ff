package graft.ops

/** WebP LOSSLESS (VP8L) decoder, from scratch (SPEC: RFC 9649 /
  * Google's "WebP Lossless Bitstream Specification"; container: RIFF
  * per the WebP container spec). Closes the r15 verdict's "largest
  * remaining web-crawl image format" gap: after JPEG
  * (baseline/progressive/color), PNG (all depths/types/tRNS/Adam7) and
  * GIF (static/animated), WebP is the last major crawl format — and
  * its LOSSLESS profile carries the same exactness anchor FLAC/PNG
  * do: decode must reproduce the encoder's input byte-for-byte.
  *
  * Scope: the FULL VP8L feature set — RIFF walk, LSB-first bit
  * reader, canonical prefix codes (simple 1-2-symbol and
  * code-length-coded forms with 16/17/18 repeats and the optional
  * max_symbol cut), META prefix-code tiling (entropy image), color
  * cache (the 0x1e35a7bd multiplicative hash), LZ77 backward
  * references with the prefix+extra-bits value coding and the
  * 120-entry 2D distance neighborhood map, and ALL FOUR transforms
  * inverted in reverse read order: PREDICTOR (14 spatial modes with
  * the spec's edge rules), COLOR (signed 3.5 fixed-point channel
  * deltas), SUBTRACT-GREEN, and COLOR-INDEXING (palette with delta
  * coding and sub-8-bit pixel BUNDLING that repacks the image width).
  * Lossy VP8 and extended VP8X containers reject loudly — never a
  * silent wrong answer.
  *
  * Verification: the container carries a REAL independent
  * implementation (system libwebp, driven via scripts/
  * gen_webp_fixtures.py) — WebpSpec decodes 40 libwebp-ENCODED
  * streams across 8 content families (gradient → predictor transform,
  * low-color → palette+bundling, tiled → 2D-mapped LZ77, random →
  * entropy+cache, …) and pins BYTE-EXACT equality against the raw
  * rasters libwebp encoded, plus rejection paths. The registered row
  * re-encodes corpus rasters through [[MultimodalOps.MediaCodec]]'s
  * own minimal VP8L encoder (cross-checked against libwebp's decoder
  * by the same script's --check-own mode) and hashes exact means.
  *
  * Cost: O(pixels) decode, O(2^cacheBits + palette + tables) state —
  * the same batched mapPartitions codec slot as every decoder.
  */
object WebpDecode {

  /** Decoded raster: per-pixel packed ARGB (the VP8L native layout). */
  final case class Decoded(width: Int, height: Int, argb: Array[Int])

  /** Feature-coverage counters for ONE decode (thread-local — the spec
    * asserts the fixture corpus genuinely exercises every decoder
    * path: a 2D-map entry or predictor mode no fixture reaches is an
    * UNTESTED table entry, and the whole point of the libwebp corpus
    * is that none stay untested).
    */
  final case class Stats(transforms: Set[Int], cacheHits: Long,
      backrefs2d: Long, backrefsLinear: Long, metaGroups: Int,
      predictorModes: Set[Int])
  // installed ONLY by decodeWithStats and removed in its finally —
  // plain decode() on executor threads never allocates or retains an
  // acc (long-lived pool threads would otherwise each hold one
  // forever); null means "not tracking"
  private val statsTl = new ThreadLocal[StatsAcc]
  @inline private def stat(f: StatsAcc => Unit): Unit = {
    val s = statsTl.get
    if (s != null) f(s)
  }
  private final class StatsAcc {
    var transforms = Set.empty[Int]
    var cacheHits = 0L
    var backrefs2d = 0L
    var backrefsLinear = 0L
    var metaGroups = 1
    var predictorModes = Set.empty[Int]
    def snapshot: Stats = Stats(transforms, cacheHits, backrefs2d,
      backrefsLinear, metaGroups, predictorModes)
  }

  /** Decode and report which decoder paths the stream exercised. */
  def decodeWithStats(bytes: Array[Byte]): (Decoded, Stats) = {
    val acc = new StatsAcc
    statsTl.set(acc)
    try {
      val d = decode(bytes)
      (d, acc.snapshot)
    } finally statsTl.remove()
  }

  // ------------------------------------------------------------ container

  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 20, "webp: truncated container")
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    require(tag(0) == "RIFF", "webp: missing RIFF header")
    require(tag(8) == "WEBP", "webp: not a WEBP RIFF form")
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val fourCC = tag(pos)
      val size = ((bytes(pos + 4) & 0xff) | ((bytes(pos + 5) & 0xff) << 8) |
        ((bytes(pos + 6) & 0xff) << 16) | ((bytes(pos + 7) & 0xffL) << 24)).toInt
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"webp: chunk $fourCC overruns the container")
      fourCC match {
        case "VP8L" =>
          return decodeVp8l(java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size))
        case "VP8 " => throw new IllegalArgumentException(
          "webp: lossy VP8 stream — use Vp8Decode (this walk is VP8L-only)")
        case "VP8X" =>
          // extended still container (EXIF/ICC/XMP around a VP8L
          // payload): the metadata walk owns it; animated containers
          // reject there with a pointer to decodeAnim
          return vp8xStill(bytes).still
        case _ => // unknown chunk: skip (padded to even size)
      }
      pos += 8 + size + (size & 1)
    }
    throw new IllegalArgumentException("webp: no VP8L chunk")
  }

  /** Width/height straight off the VP8L header — ~5 payload bytes
    * touched per stream, no entropy decode (the mm_jpeg_meta shape:
    * dimension harvesting over compressed bytes at ingest).
    */
  def dims(bytes: Array[Byte]): (Int, Int) = {
    require(bytes.length >= 20, "webp: truncated container")
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WEBP", "webp: not a WEBP RIFF")
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val fourCC = tag(pos)
      val size = ((bytes(pos + 4) & 0xff) | ((bytes(pos + 5) & 0xff) << 8) |
        ((bytes(pos + 6) & 0xff) << 16) | ((bytes(pos + 7) & 0xffL) << 24)).toInt
      if (fourCC == "VP8L") {
        require(size >= 5 && pos + 13 <= bytes.length, "webp: short VP8L chunk")
        val b = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 13)
        val br = new Br(b)
        require(br.bits(8) == 0x2f, "vp8l: bad signature byte")
        return (br.bits(14) + 1, br.bits(14) + 1)
      }
      if (fourCC == "VP8X") {
        // canvas dims sit in the VP8X header itself — still zero
        // entropy decode, ~10 payload bytes touched
        require(size == 10 && pos + 18 <= bytes.length,
          "webp: VP8X chunk must be 10 bytes")
        def u24(i: Int): Int = (bytes(i) & 0xff) |
          ((bytes(i + 1) & 0xff) << 8) | ((bytes(i + 2) & 0xff) << 16)
        return (u24(pos + 12) + 1, u24(pos + 15) + 1)
      }
      require(fourCC != "VP8 ", s"webp: $fourCC out of subset")
      pos += 8 + size + (size & 1)
    }
    throw new IllegalArgumentException("webp: no VP8L chunk")
  }

  /** RGBA interleaved samples (PngDecode-style) for the mean oracles. */
  def toRgba(d: Decoded): Array[Int] = {
    val out = new Array[Int](d.argb.length * 4)
    var i = 0
    while (i < d.argb.length) {
      val p = d.argb(i)
      out(4 * i) = (p >>> 16) & 0xff
      out(4 * i + 1) = (p >>> 8) & 0xff
      out(4 * i + 2) = p & 0xff
      out(4 * i + 3) = (p >>> 24) & 0xff
      i += 1
    }
    out
  }

  // ------------------------------------------------ VP8X still container

  /** Parsed VP8X still container: canvas dims, feature flags, the raw
    * metadata chunk payloads, and the decoded VP8L pixels.
    */
  final case class Vp8xStill(canvasWidth: Int, canvasHeight: Int,
      hasIcc: Boolean, hasAlpha: Boolean, hasExif: Boolean,
      hasXmp: Boolean, icc: Option[Array[Byte]], exif: Option[Array[Byte]],
      xmp: Option[Array[Byte]], still: Decoded)

  /** VP8X STILL-image container walk (r17 — the metadata-sidecar
    * ingest shape for crawled WebP: real crawls wrap VP8L payloads in
    * VP8X purely to carry EXIF/ICC/XMP; WebP container spec, "Extended
    * file format"). Walks VP8X flags + canvas, collects ICCP/EXIF/XMP
    * chunk payloads verbatim (EXIF parsing composes [[ExifCodec]]
    * downstream — this walk never interprets them), decodes the VP8L
    * still, and enforces the spec's flag↔chunk consistency (a set
    * feature bit without its chunk, or vice versa, is a malformed
    * mux — reject, never a silent drop). Animated VP8X belongs to
    * [[decodeAnim]]; lossy VP8 / ALPH stay out of subset and reject.
    */
  def vp8xStill(bytes: Array[Byte]): Vp8xStill = {
    require(bytes.length >= 30, "webp: truncated container")
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    def u24(i: Int): Int = (bytes(i) & 0xff) |
      ((bytes(i + 1) & 0xff) << 8) | ((bytes(i + 2) & 0xff) << 16)
    def u32le(i: Int): Long =
      (u24(i) & 0xffffffL) | ((bytes(i + 3) & 0xffL) << 24)
    require(tag(0) == "RIFF" && tag(8) == "WEBP", "webp: not a WEBP RIFF")
    require(tag(12) == "VP8X", "webp: VP8X chunk required first")
    require(u32le(16) == 10, "webp: VP8X chunk must be 10 bytes")
    val flags = bytes(20) & 0xff
    require((flags & 0x02) == 0,
      "webp: animated VP8X container — use decodeAnim")
    val cw = u24(24) + 1
    val ch = u24(27) + 1
    var pos = 30
    var icc: Option[Array[Byte]] = None
    var exif: Option[Array[Byte]] = None
    var xmp: Option[Array[Byte]] = None
    var still: Option[Decoded] = None
    while (pos + 8 <= bytes.length) {
      val fourCC = tag(pos)
      val size = u32le(pos + 4).toInt
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"webp: chunk $fourCC overruns the container")
      def body: Array[Byte] =
        java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
      fourCC match {
        case "ICCP" => icc = Some(body)
        case "EXIF" => exif = Some(body)
        case "XMP " => xmp = Some(body)
        case "VP8L" => still = Some(decodeVp8l(body))
        case "VP8 " => throw new IllegalArgumentException(
          "webp: lossy VP8 stream — use Vp8Decode (this walk is VP8L-only)")
        case "ALPH" => throw new IllegalArgumentException(
          "webp: ALPH accompanies lossy VP8 only — out of subset")
        case _ => // unknown chunk: skip (padded to even size)
      }
      pos += 8 + size + (size & 1)
    }
    require(((flags & 0x20) != 0) == icc.isDefined,
      "webp: VP8X ICC flag/chunk mismatch")
    require(((flags & 0x08) != 0) == exif.isDefined,
      "webp: VP8X EXIF flag/chunk mismatch")
    require(((flags & 0x04) != 0) == xmp.isDefined,
      "webp: VP8X XMP flag/chunk mismatch")
    val d = still.getOrElse(throw new IllegalArgumentException(
      "webp: VP8X still container carries no VP8L payload"))
    require(d.width == cw && d.height == ch,
      s"webp: VP8X canvas ${cw}x$ch != still ${d.width}x${d.height}")
    Vp8xStill(cw, ch, icc.isDefined, (flags & 0x10) != 0, exif.isDefined,
      xmp.isDefined, icc, exif, xmp, d)
  }

  // ------------------------------------------------------- animated WebP

  /** One animation frame: rect placement + composition flags (WebP
    * container spec, ANMF chunk) and its decoded VP8L pixels.
    */
  final case class AnimFrame(x: Int, y: Int, width: Int, height: Int,
      durationMs: Int, blend: Boolean, disposeToBg: Boolean,
      pixels: Array[Int])

  /** Decoded animation: canvas dims, ANIM background color, frames,
    * and the COMPOSED canvas after each frame (the viewer contract:
    * blend-or-overwrite onto the canvas, then the frame's disposal
    * applies before the next frame).
    */
  final case class Anim(width: Int, height: Int, background: Int,
      loops: Int, frames: Vector[AnimFrame], canvases: Vector[Array[Int]])

  /** ANIMATED WebP decode (VP8X + ANIM + ANMF per the public WebP
    * container spec): the GIF89a-composition twin. Frame payloads may
    * be VP8L (lossless), lossy VP8, or VP8+ALPH (r18 — real crawled
    * animated WebP, stickers and converted GIFs, is predominantly
    * lossy): [[Vp8Decode]]'s sample-exact keyframe core + the ALPH
    * sidecar decoder + [[Vp8Decode.yuvToArgb]] (kernel behaviorally
    * pinned vs WebPDecodeRGBA) feed the same compositor as VP8L
    * frames. The pixel cores are canonically verified (WebpSpec /
    * Vp8Spec libwebp corpora); the CONTAINER walk and dispose/
    * background/blend composition are spec-derived and pinned by
    * hand-assembled streams (offsets, dispose-to-background,
    * blend-over-transparency, mixed VP8L/VP8/VP8+ALPH frames — the
    * animv* pack) whose expected canvases come from libwebp's
    * per-frame still decode composed by an INDEPENDENT replay
    * (scripts/gen_vp8_anim_fixtures.py) — the system libwebp.so.7
    * core cannot arbitrate composition itself (animation demux lives
    * in libwebpdemux, absent from this container), the same evidence
    * standard the GIF composition work shipped under.
    */
  def decodeAnim(bytes: Array[Byte]): Anim = {
    require(bytes.length >= 30, "webp: truncated container")
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    def u24(i: Int): Int =
      (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) | ((bytes(i + 2) & 0xff) << 16)
    def u32le(i: Int): Long =
      (u24(i) & 0xffffffL) | ((bytes(i + 3) & 0xffL) << 24)
    require(tag(0) == "RIFF" && tag(8) == "WEBP", "webp: not a WEBP RIFF")
    require(tag(12) == "VP8X", "webp: animation requires a VP8X chunk")
    require(u32le(16) == 10, "webp: VP8X chunk must be 10 bytes")
    val flags = bytes(20) & 0xff
    require((flags & 0x02) != 0, "webp: VP8X without the animation flag")
    val cw = u24(24) + 1
    val ch = u24(27) + 1
    var pos = 30
    var background = 0
    var loops = 0
    var sawAnim = false
    val frames = Vector.newBuilder[AnimFrame]
    while (pos + 8 <= bytes.length) {
      val fourCC = tag(pos)
      val size = u32le(pos + 4).toInt
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"webp: chunk $fourCC overruns the container")
      fourCC match {
        case "ANIM" =>
          require(size == 6, s"webp: ANIM size $size")
          // background color is stored B, G, R, A (spec); repack ARGB
          background = ((bytes(pos + 11) & 0xff) << 24) |
            ((bytes(pos + 10) & 0xff) << 16) | ((bytes(pos + 9) & 0xff) << 8) |
            (bytes(pos + 8) & 0xff)
          loops = (bytes(pos + 12) & 0xff) | ((bytes(pos + 13) & 0xff) << 8)
          sawAnim = true
        case "ANMF" =>
          require(sawAnim, "webp: ANMF before ANIM")
          require(size >= 24, s"webp: ANMF size $size")
          val fx = u24(pos + 8) * 2
          val fy = u24(pos + 11) * 2
          val fw = u24(pos + 14) + 1
          val fh = u24(pos + 17) + 1
          val dur = u24(pos + 20)
          val fflags = bytes(pos + 23) & 0xff
          val blend = (fflags & 0x02) == 0 // bit 1: 0 = alpha-blend
          val disposeToBg = (fflags & 0x01) != 0 // bit 0: 1 = dispose-to-bg
          // frame data: [optional ALPH chunk +] ONE image chunk — VP8L
          // (lossless) or VP8 (lossy keyframe, r18: the majority of
          // real crawled animated WebP)
          var fpos = pos + 24
          var alph: Option[Array[Byte]] = None
          if (tag(fpos) == "ALPH") {
            val asz = u32le(fpos + 4).toInt
            require(asz >= 0 && fpos + 8 + asz <= pos + 8 + size,
              "webp: ALPH overruns its ANMF")
            alph = Some(java.util.Arrays.copyOfRange(
              bytes, fpos + 8, fpos + 8 + asz))
            fpos += 8 + asz + (asz & 1)
            require(fpos + 8 <= pos + 8 + size, "webp: ANMF ends after ALPH")
          }
          val ft = tag(fpos)
          val fsize = u32le(fpos + 4).toInt
          require(fsize >= 0 && fpos + 8 + fsize <= pos + 8 + size,
            "webp: frame payload overruns its ANMF")
          val px = ft match {
            case "VP8L" =>
              require(alph.isEmpty,
                "webp: ALPH may not accompany a VP8L frame (spec: lossless carries its own alpha)")
              val d = decodeVp8l(java.util.Arrays.copyOfRange(
                bytes, fpos + 8, fpos + 8 + fsize))
              require(d.width == fw && d.height == fh,
                s"webp: ANMF says ${fw}x$fh, VP8L says ${d.width}x${d.height}")
              d.argb
            case "VP8 " =>
              val yuv = Vp8Decode.decodeFrameChunk(bytes, fpos + 8, fsize)
              require(yuv.width == fw && yuv.height == fh,
                s"webp: ANMF says ${fw}x$fh, VP8 says ${yuv.width}x${yuv.height}")
              Vp8Decode.yuvToArgb(yuv,
                alph.map(Vp8Decode.decodeAlphaChunk(_, fw, fh)))
            case other => throw new IllegalArgumentException(
              s"webp: $other frame payload out of subset")
          }
          require(fx + fw <= cw && fy + fh <= ch,
            s"webp: frame rect ($fx,$fy ${fw}x$fh) outside the ${cw}x$ch canvas")
          frames += AnimFrame(fx, fy, fw, fh, dur, blend, disposeToBg, px)
        case _ => // ICCP/EXIF/XMP etc: skip
      }
      pos += 8 + size + (size & 1)
    }
    require(sawAnim, "webp: no ANIM chunk")
    val fs = frames.result()
    require(fs.nonEmpty, "webp: animation with no frames")
    // composition: canvas starts fully transparent; per frame BLEND or
    // OVERWRITE the rect, snapshot, then apply disposal
    val canvas = new Array[Int](cw * ch)
    val canvases = Vector.newBuilder[Array[Int]]
    fs.foreach { f =>
      var yy = 0
      while (yy < f.height) {
        var xx = 0
        while (xx < f.width) {
          val src = f.pixels(yy * f.width + xx)
          val ci = (f.y + yy) * cw + (f.x + xx)
          canvas(ci) =
            if (!f.blend) src
            else blendPx(src, canvas(ci))
          xx += 1
        }
        yy += 1
      }
      canvases += canvas.clone()
      if (f.disposeToBg) {
        var yy2 = 0
        while (yy2 < f.height) {
          var xx2 = 0
          while (xx2 < f.width) {
            canvas((f.y + yy2) * cw + (f.x + xx2)) = background
            xx2 += 1
          }
          yy2 += 1
        }
      }
    }
    Anim(cw, ch, background, loops, fs, canvases.result())
  }

  /** Spec "src over dst" with 8-bit alpha (exact at the fixture corpus'
    * alpha ∈ {0, 255}; fractional alpha follows the spec formula with
    * integer rounding toward zero).
    */
  private def blendPx(src: Int, dst: Int): Int = {
    val as = (src >>> 24) & 0xff
    if (as == 255) return src
    if (as == 0) return dst
    val ad = (dst >>> 24) & 0xff
    val aOut = as + ad * (255 - as) / 255
    if (aOut == 0) return 0
    def ch(sh: Int): Int = {
      val cs = (src >>> sh) & 0xff
      val cd = (dst >>> sh) & 0xff
      (cs * as + cd * ad * (255 - as) / 255) / aOut
    }
    (aOut << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  // ------------------------------------------------------------ bit reader

  /** LSB-first bit reader (VP8L convention: bits fill from the low end
    * of each byte).
    */
  private final class Br(b: Array[Byte]) {
    private var bitPos = 0L
    def bit(): Int = {
      val byteIdx = (bitPos >> 3).toInt
      if (byteIdx >= b.length)
        throw new IllegalArgumentException("vp8l: truncated bitstream")
      val r = (b(byteIdx) >> (bitPos & 7).toInt) & 1
      bitPos += 1
      r
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  // --------------------------------------------------------- prefix codes

  /** Canonical prefix code over `lengths` (0 = absent): DEFLATE-style
    * canonical assignment (by length, then symbol), decoded MSB-of-
    * code-first against the LSB-first stream. Single-symbol codes read
    * ZERO bits (the spec's degenerate case).
    */
  private final class Huff(lengths: Array[Int]) {
    private val present = lengths.count(_ > 0)
    require(present > 0, "vp8l: empty prefix code")
    private val single = if (present == 1) lengths.indexWhere(_ > 0) else -1
    // per-length first-code and symbol tables
    private val maxLen = lengths.max
    private val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    private val firstCode: Array[Int] = new Array[Int](maxLen + 2)
    private val firstIdx: Array[Int] = new Array[Int](maxLen + 2)
    locally {
      var code = 0
      var idx = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = code
        firstIdx(l) = idx
        code = (code + count(l)) << 1
        idx += count(l)
        l += 1
      }
      // completeness: Kraft sum must close exactly (over-subscribed or
      // incomplete codes are invalid streams, except the 1-symbol case)
      if (single < 0)
        require((firstCode(maxLen) + count(maxLen)) == (1 << maxLen),
          "vp8l: prefix code is not complete")
    }
    private val symbols: Array[Int] = new Array[Int](present)
    locally {
      val next = firstIdx.clone()
      var s = 0
      while (s < lengths.length) {
        val l = lengths(s)
        if (l > 0) { symbols(next(l)) = s; next(l) += 1 }
        s += 1
      }
    }
    def decode(br: Br): Int = {
      if (single >= 0) return single
      var code = 0
      var l = 0
      while (true) {
        code = (code << 1) | br.bit()
        l += 1
        if (l > maxLen) throw new IllegalArgumentException("vp8l: bad prefix code")
        if (l <= maxLen && count(l) > 0 && code - firstCode(l) < count(l))
          return symbols(firstIdx(l) + code - firstCode(l))
      }
      -1 // unreachable
    }
  }

  /** Order in which the code-length code's lengths are transmitted. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or code-length-coded normal form). */
  private def readCode(br: Br, alphabetSize: Int): Huff = {
    if (br.bit() == 1) { // simple
      val numSymbols = br.bit() + 1
      val first8 = br.bit() == 1
      val s0 = br.bits(if (first8) 8 else 1)
      val lens = new Array[Int](alphabetSize)
      require(s0 < alphabetSize, s"vp8l: simple-code symbol $s0 out of alphabet")
      if (numSymbols == 1) lens(s0) = 1 // 1-symbol code decodes with 0 bits
      else {
        val s1 = br.bits(8)
        require(s1 < alphabetSize && s1 != s0, "vp8l: bad simple-code symbols")
        lens(s0) = 1; lens(s1) = 1
      }
      new Huff(lens)
    } else { // normal: code-length code first
      val numCl = 4 + br.bits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      val clHuff = new Huff(clLens)
      var maxSymbol =
        if (br.bit() == 1) {
          val lengthNBits = 2 + 2 * br.bits(3)
          2 + br.bits(lengthNBits)
        } else alphabetSize
      val lens = new Array[Int](alphabetSize)
      var prevLen = 8
      var symbol = 0
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clHuff.decode(br)
        if (cl < 16) {
          lens(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeat, value) = cl match {
            case 16 => (3 + br.bits(2), prevLen)
            case 17 => (3 + br.bits(3), 0)
            case 18 => (11 + br.bits(7), 0)
            case x => throw new IllegalArgumentException(s"vp8l: CL symbol $x")
          }
          // a repeat that runs past the alphabet end is an illegal
          // stream (libwebp's ReadHuffmanCodeLengths errors on
          // symbol + repeat > num_symbols) — reject, don't clamp
          if (symbol + repeat > alphabetSize)
            throw new IllegalArgumentException(
              s"vp8l: CL repeat $repeat overruns alphabet " +
                s"($symbol + $repeat > $alphabetSize)")
          var r = 0
          while (r < repeat) {
            lens(symbol) = value; symbol += 1; r += 1
          }
        }
      }
      new Huff(lens)
    }
  }

  /** One prefix-code group: green+length+cache, red, blue, alpha,
    * distance.
    */
  private final case class Group(green: Huff, red: Huff, blue: Huff,
      alpha: Huff, dist: Huff)

  private def readGroup(br: Br, cacheSize: Int): Group =
    Group(
      green = readCode(br, 256 + 24 + cacheSize),
      red = readCode(br, 256),
      blue = readCode(br, 256),
      alpha = readCode(br, 256),
      dist = readCode(br, 40))

  // --------------------------------------------------------- LZ77 pieces

  /** Prefix+extra-bits value coding shared by lengths and distances. */
  private def prefixValue(code: Int, br: Br): Int = {
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.bits(extraBits) + 1
    }
  }

  /** The spec's 120-entry close-neighborhood (dx, dy) map for distance
    * codes 1..120 (codes above 120 are linear: code − 120). DERIVED
    * BEHAVIORALLY from the canonical system-libwebp decoder (scripts/
    * derive_webp_distmap.py hand-assembles a VP8L stream per plane
    * code whose single backref reveals its (dx, dy) — position-unique
    * pixel colors make the copied source identifiable), so every entry
    * is pinned against the public implementation, not recollection;
    * WebpSpec's fixture corpus then exercises the map end-to-end.
    */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def mapDistance(planeCode: Int, xsize: Int): Int = {
    if (planeCode > 120) planeCode - 120
    else {
      val (dx, dy) = DistMap(planeCode - 1)
      val d = dy * xsize + dx
      math.max(1, d)
    }
  }

  // ------------------------------------------------------ image decoding

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** One transform, in read order. `data` is the raw decoded transform
    * sub-image (tiles or palette), `bits` the tile/bundle size bits.
    */
  private final case class Transform(typ: Int, bits: Int, data: Array[Int],
      dataXs: Int)

  private val PredictorT = 0
  private val ColorT = 1
  private val SubtractGreenT = 2
  private val ColorIndexingT = 3

  private def decodeVp8l(data: Array[Byte]): Decoded = {
    val br = new Br(data)
    require(br.bits(8) == 0x2f, "vp8l: bad signature byte")
    val width = br.bits(14) + 1
    val height = br.bits(14) + 1
    br.bit() // alpha-is-used hint
    require(br.bits(3) == 0, "vp8l: unknown version")
    val argb = decodeImageStream(br, width, height, level0 = true)
    Decoded(width, height, argb)
  }

  /** HEADERLESS VP8L image-stream decode for WebP ALPH payloads (the
    * container spec's alpha compression method 1): dimensions come
    * from the container, the stream starts straight at the level-0
    * image-stream grammar, and the alpha value rides the GREEN
    * channel. Used by [[Vp8Decode]]'s ALPH walk.
    */
  private[ops] def decodeAlphaStream(data: Array[Byte], width: Int,
      height: Int): Array[Byte] = {
    val argb = decodeImageStream(new Br(data), width, height, level0 = true)
    val out = new Array[Byte](argb.length)
    var i = 0
    while (i < argb.length) {
      out(i) = ((argb(i) >>> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** The recursive image-stream decoder: transforms (level 0 only) →
    * color cache → meta prefix codes (level 0 only) → pixel data →
    * inverse transforms in reverse read order.
    */
  private def decodeImageStream(br: Br, xsize0: Int, ysize: Int,
      level0: Boolean): Array[Int] = {
    var xs = xsize0
    val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
    if (level0) {
      val seen = new Array[Boolean](4)
      while (br.bit() == 1) {
        val t = br.bits(2)
        require(!seen(t), s"vp8l: transform $t appears twice")
        seen(t) = true
        stat(_.transforms += t)
        t match {
          case PredictorT | ColorT =>
            val bits = br.bits(3) + 2
            val txs = subSize(xs, bits)
            val tys = subSize(ysize, bits)
            transforms += Transform(t, bits,
              decodeImageStream(br, txs, tys, level0 = false), txs)
          case SubtractGreenT =>
            transforms += Transform(t, 0, Array.empty, 0)
          case ColorIndexingT =>
            val nColors = br.bits(8) + 1
            val widthBits =
              if (nColors <= 2) 3 else if (nColors <= 4) 2
              else if (nColors <= 16) 1 else 0
            val raw = decodeImageStream(br, nColors, 1, level0 = false)
            // palette entries are DELTA-coded per channel
            val pal = new Array[Int](nColors)
            var acc = 0
            var i = 0
            while (i < nColors) {
              acc = addPixels(acc, raw(i))
              pal(i) = acc
              i += 1
            }
            transforms += Transform(t, widthBits, pal, xs) // dataXs = ORIGINAL width
            if (widthBits > 0) xs = subSize(xs, widthBits)
          case x => throw new IllegalArgumentException(s"vp8l: transform $x")
        }
      }
    }
    // color cache
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    require(cacheBits <= 11, s"vp8l: color cache bits $cacheBits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta prefix codes (level 0 only)
    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaXs = 0
    if (level0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      metaXs = subSize(xs, metaBits)
      metaImg = decodeImageStream(br, metaXs, subSize(ysize, metaBits),
        level0 = false)
    }
    val numGroups =
      if (metaImg == null) 1
      else metaImg.foldLeft(0)((m, p) => math.max(m, (p >>> 8) & 0xffff)) + 1
    if (level0) stat(_.metaGroups = numGroups)
    val groups = Array.fill(numGroups)(readGroup(br, cacheSize))

    // ------------------------------------------------------- pixel data
    val n = xs * ysize
    val out = new Array[Int](n)
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    def cacheInsert(p: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    var pos = 0
    while (pos < n) {
      val x = pos % xs
      val y = pos / xs
      val g =
        if (metaImg == null) groups(0)
        else {
          val mp = metaImg((y >> metaBits) * metaXs + (x >> metaBits))
          groups((mp >>> 8) & 0xffff)
        }
      val s = g.green.decode(br)
      if (s < 256) { // literal: G then R, B, A through their own codes
        val red = g.red.decode(br)
        val blue = g.blue.decode(br)
        val alpha = g.alpha.decode(br)
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = p
        cacheInsert(p)
        pos += 1
      } else if (s < 256 + 24) { // backward reference
        val length = prefixValue(s - 256, br)
        val distCode = g.dist.decode(br)
        val dist0 = prefixValue(distCode, br)
        val dist = mapDistance(dist0, xs)
        if (dist0 > 120) stat(_.backrefsLinear += 1)
        else stat(_.backrefs2d += 1)
        require(dist <= pos && pos + length <= n,
          s"vp8l: back-reference out of window (pos=$pos dist=$dist len=$length)")
        var i = 0
        while (i < length) {
          val p = out(pos - dist)
          out(pos) = p
          cacheInsert(p)
          pos += 1
          i += 1
        }
      } else { // color-cache hit
        require(cache != null, "vp8l: cache symbol without a color cache")
        val idx = s - 256 - 24
        require(idx < cacheSize, s"vp8l: cache index $idx")
        stat(_.cacheHits += 1)
        out(pos) = cache(idx)
        pos += 1
      }
    }

    // ------------------------------------- inverse transforms (reverse)
    var img = out
    var curXs = xs
    transforms.reverseIterator.foreach { tr =>
      tr.typ match {
        case ColorIndexingT =>
          img = inverseColorIndexing(img, curXs, ysize, tr)
          curXs = tr.dataXs
        case SubtractGreenT =>
          var i = 0
          while (i < img.length) {
            val p = img(i)
            val gch = (p >>> 8) & 0xff
            val r = ((p >>> 16) + gch) & 0xff
            val b = (p + gch) & 0xff
            img(i) = (p & 0xff00ff00) | (r << 16) | b
            i += 1
          }
        case ColorT =>
          inverseColor(img, curXs, ysize, tr)
        case PredictorT =>
          inversePredictor(img, curXs, ysize, tr)
      }
    }
    img
  }

  /** Per-channel byte-wise pixel addition (the palette delta rule). */
  private def addPixels(a: Int, b: Int): Int = {
    val ch = ((a & 0xff00ff00L) + (b & 0xff00ff00L)) & 0xff00ff00L
    val cl = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    (ch | cl).toInt
  }

  private def inverseColorIndexing(img: Array[Int], packedXs: Int,
      ysize: Int, tr: Transform): Array[Int] = {
    val pal = tr.data
    val widthBits = tr.bits
    val xsOut = tr.dataXs
    if (widthBits == 0) {
      var i = 0
      val out = new Array[Int](img.length)
      while (i < img.length) {
        val idx = (img(i) >>> 8) & 0xff
        out(i) = if (idx < pal.length) pal(idx) else 0
        i += 1
      }
      out
    } else {
      val out = new Array[Int](xsOut * ysize)
      val pixelsPerByte = 1 << widthBits
      val bitsPerPixel = 8 >> widthBits
      val mask = (1 << bitsPerPixel) - 1
      var y = 0
      while (y < ysize) {
        var x = 0
        while (x < xsOut) {
          val packed = (img(y * packedXs + (x >> widthBits)) >>> 8) & 0xff
          val idx = (packed >> (bitsPerPixel * (x & (pixelsPerByte - 1)))) & mask
          out(y * xsOut + x) = if (idx < pal.length) pal(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Signed 3.5 fixed-point delta: (int8(t) * int8(c)) >> 5. */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  private def inverseColor(img: Array[Int], xs: Int, ysize: Int,
      tr: Transform): Unit = {
    val bits = tr.bits
    var y = 0
    while (y < ysize) {
      var x = 0
      while (x < xs) {
        val cte = tr.data((y >> bits) * tr.dataXs + (x >> bits))
        val g2r = cte & 0xff          // blue channel of the element
        val g2b = (cte >>> 8) & 0xff  // green channel
        val r2b = (cte >>> 16) & 0xff // red channel
        val p = img(y * xs + x)
        val gch = (p >>> 8) & 0xff
        var r = (p >>> 16) & 0xff
        var b = p & 0xff
        r = (r + ctDelta(g2r, gch)) & 0xff
        b = (b + ctDelta(g2b, gch)) & 0xff
        b = (b + ctDelta(r2b, r)) & 0xff
        img(y * xs + x) = (p & 0xff00ff00.toInt) | (r << 16) | b
        x += 1
      }
      y += 1
    }
  }

  // per-channel average, (a+b)/2 floor
  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val c = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
      out |= c << sh
      sh += 8
    }
    out
  }

  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      val c = clamp255(a + (a - b) / 2)
      out |= c << sh
      sh += 8
    }
    out
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    // predicted = L + T − TL per channel; pick the of L/T closer to it
    var pl = 0
    var pt = 0
    var sh = 0
    while (sh < 32) {
      val lc = (l >>> sh) & 0xff
      val tc = (t >>> sh) & 0xff
      val tlc = (tl >>> sh) & 0xff
      val pc = lc + tc - tlc
      pl += math.abs(pc - lc)
      pt += math.abs(pc - tc)
      sh += 8
    }
    if (pl < pt) l else t
  }

  private def inversePredictor(img: Array[Int], xs: Int, ysize: Int,
      tr: Transform): Unit = {
    val bits = tr.bits
    var y = 0
    while (y < ysize) {
      var x = 0
      while (x < xs) {
        val i = y * xs + x
        val pred: Int =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) img(i - 1) // first row: L
          else if (x == 0) img(i - xs) // first column: T
          else {
            val mode = (tr.data((y >> bits) * tr.dataXs + (x >> bits)) >>> 8) & 0xff
            stat(_.predictorModes += mode)
            val l = img(i - 1)
            val t = img(i - xs)
            val tl = img(i - xs - 1)
            // top-right: one past the row above in the FLAT layout —
            // at the last column that lands on the CURRENT row's first
            // pixel (already decoded), the canonical edge semantics
            // (pinned by the hand-assembled predmodes fixture)
            val tRight = img(i - xs + 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tRight
              case 4 => tl
              case 5 => avg2(avg2(l, tRight), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tRight)
              case 10 => avg2(avg2(l, tl), avg2(t, tRight))
              case 11 => select(l, t, tl)
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(avg2(l, t), tl)
              case m => throw new IllegalArgumentException(s"vp8l: predictor $m")
            }
          }
        img(i) = addPixels(img(i), pred)
        x += 1
      }
      y += 1
    }
  }
}
