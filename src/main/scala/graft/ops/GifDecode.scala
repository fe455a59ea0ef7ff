package graft.ops

/** GIF decoder with a from-scratch LZW entropy stage (SPEC: GIF87a/89a,
  * CompuServe 1987/1989 §§17-23 + Appendix F; LZW per Welch 1984) —
  * the LOSSLESS entropy codec beside [[JpegDecode]]'s lossy DCT path:
  * header + logical-screen-descriptor parse, global/local color
  * tables, extension-block skipping (GCE/comment/application),
  * sub-block reassembly, and variable-width LZW decoding (clear/EOI
  * codes, dictionary growth to 12 bits with the deferred-clear rule,
  * the first-code-after-clear and KwKwK special cases). Interlaced
  * images de-interlace per the spec's four-pass row schedule.
  *
  * Because GIF is lossless, the registered row hashes the decoded
  * raster's EXACT mean against the pre-encode closed form — a stronger
  * oracle than the JPEG row's tolerance bands: one wrong palette
  * index anywhere moves the mean. Gray rasters round-trip through the
  * JDK encoder's 256-gray palette; the decoder reads any palette and
  * takes the red channel (r=g=b for gray fixtures).
  *
  * Cost shape: O(pixels) per payload, ~16 KB table state, run inside
  * the batched mapPartitions codec slot — only per-image stats leave
  * the task.
  */
object GifDecode {

  final case class Decoded(width: Int, height: Int, pixels: Array[Int])

  /** One animation frame: rect placement, GCE timing/disposal, and the
    * frame's OWN rect pixels (palette-resolved red channel; -1 where
    * the GCE transparency index punched a hole).
    */
  final case class Frame(x: Int, y: Int, width: Int, height: Int,
      delayCs: Int, disposal: Int, pixels: Array[Int])

  /** Decoded animation: logical-screen canvas size, per-frame rects,
    * and the COMPOSED canvas after each frame — what a viewer shows,
    * with §23 disposal semantics applied between frames.
    */
  final case class Animation(width: Int, height: Int,
      frames: Vector[Frame], canvases: Vector[Array[Int]])

  /** ANIMATED GIF decode (r15 — GIF89a §§23/26: graphic-control
    * extensions, multiple image descriptors with rect offsets, local
    * color tables, transparency holes, disposal methods none/keep(1),
    * restore-background(2) and restore-previous(3)). Each frame's LZW
    * stream decodes through the same entropy stage as [[decode]];
    * composition replays the viewer contract: draw the rect (skipping
    * transparent indices), snapshot, then apply the frame's disposal
    * before the next draw.
    */
  def decodeFrames(bytes: Array[Byte]): Animation = {
    def u8(i: Int): Int = {
      if (i >= bytes.length)
        throw new IllegalArgumentException("gif: truncated stream")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val magic = new String(bytes.take(6), "US-ASCII")
    require(magic == "GIF87a" || magic == "GIF89a", s"gif: bad magic '$magic'")
    var i = 6
    val sw = u16(i); val sh = u16(i + 2)
    require(sw > 0 && sh > 0, "gif: empty logical screen")
    val packed = u8(i + 4)
    val bgIndex = u8(i + 5)
    i += 7
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = Array.tabulate(n)(k => u8(i + 3 * k))
      i += 3 * n
    }
    val bg = if (gct != null && bgIndex < gct.length) gct(bgIndex) else 0
    val canvas = Array.fill(sw * sh)(bg)
    val frames = Vector.newBuilder[Frame]
    val canvases = Vector.newBuilder[Array[Int]]
    // pending GCE state, consumed by the next image descriptor
    var delayCs = 0
    var disposal = 0
    var transparent = -1
    var done = false
    while (!done) {
      u8(i) match {
        case 0x3b => done = true
        case 0x21 =>
          val label = u8(i + 1)
          i += 2
          if (label == 0xf9) { // graphic control extension (§23)
            require(u8(i) == 4, "gif: GCE block size must be 4")
            val p = u8(i + 1)
            disposal = (p >> 2) & 7
            require(disposal <= 3, s"gif: reserved disposal method $disposal")
            delayCs = u16(i + 2)
            transparent = if ((p & 1) != 0) u8(i + 4) else -1
            i += 5
            require(u8(i) == 0, "gif: unterminated GCE")
            i += 1
          } else { // comment/application/plain-text: skip sub-blocks
            while (u8(i) != 0) i += 1 + u8(i)
            i += 1
          }
        case 0x2c =>
          val fx = u16(i + 1); val fy = u16(i + 3)
          val w = u16(i + 5); val h = u16(i + 7)
          val ip = u8(i + 9)
          i += 10
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            pal = Array.tabulate(n)(k => u8(i + 3 * k))
            i += 3 * n
          }
          require(pal != null, "gif: no color table")
          require(fx + w <= sw && fy + h <= sh,
            s"gif: frame rect ($fx,$fy ${w}x$h) outside ${sw}x$sh screen")
          val interlaced = (ip & 0x40) != 0
          val minCode = u8(i); i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (u8(i) != 0) {
            val n = u8(i)
            if (i + 1 + n > bytes.length)
              throw new IllegalArgumentException("gif: truncated sub-block")
            data.write(bytes, i + 1, n)
            i += 1 + n
          }
          i += 1 // sub-block terminator
          val indices = lzw(data.toByteArray, minCode, w * h)
          val px = new Array[Int](w * h)
          def resolve(src: Int, dst: Int): Unit = {
            val idx = indices(src)
            px(dst) = if (idx == transparent) -1 else pal(idx)
          }
          if (!interlaced) {
            var k = 0
            while (k < w * h) { resolve(k, k); k += 1 }
          } else {
            val starts = Array(0, 4, 2, 1)
            val steps = Array(8, 8, 4, 2)
            var src = 0
            var p = 0
            while (p < 4) {
              var y = starts(p)
              while (y < h) {
                var x = 0
                while (x < w) { resolve(src, y * w + x); src += 1; x += 1 }
                y += steps(p)
              }
              p += 1
            }
          }
          // compose: snapshot for disposal 3, draw, record, dispose
          val before =
            if (disposal == 3) java.util.Arrays.copyOf(canvas, canvas.length)
            else null
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = px(y * w + x)
              if (v >= 0) canvas((fy + y) * sw + (fx + x)) = v
              x += 1
            }
            y += 1
          }
          frames += Frame(fx, fy, w, h, delayCs, disposal, px)
          canvases += java.util.Arrays.copyOf(canvas, canvas.length)
          disposal match {
            case 2 => // restore the rect to background
              var yy = 0
              while (yy < h) {
                var xx = 0
                while (xx < w) {
                  canvas((fy + yy) * sw + (fx + xx)) = bg; xx += 1
                }
                yy += 1
              }
            case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => ()
          }
          delayCs = 0; disposal = 0; transparent = -1
        case other =>
          throw new IllegalArgumentException(f"gif: unexpected block $other%02x")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "gif: no image data before trailer")
    Animation(sw, sh, fs, canvases.result())
  }

  def decode(bytes: Array[Byte]): Decoded = {
    def u8(i: Int): Int = {
      if (i >= bytes.length)
        throw new IllegalArgumentException("gif: truncated stream")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8) // little-endian
    val magic = new String(bytes.take(6), "US-ASCII")
    require(magic == "GIF87a" || magic == "GIF89a", s"gif: bad magic '$magic'")
    var i = 6
    // logical screen descriptor
    i += 4 // screen width/height (the image descriptor carries its own)
    val packed = u8(i); i += 3 // packed, bg index, aspect
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = Array.tabulate(n)(k => u8(i + 3 * k)) // red channel
      i += 3 * n
    }
    while (true) {
      u8(i) match {
        case 0x3b => throw new IllegalArgumentException("gif: trailer before image")
        case 0x21 => // extension: label + sub-blocks until 0 terminator
          i += 2
          while (u8(i) != 0) i += 1 + u8(i)
          i += 1
        case 0x2c => // image descriptor
          val w = u16(i + 5)
          val h = u16(i + 7)
          val ip = u8(i + 9)
          i += 10
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            pal = Array.tabulate(n)(k => u8(i + 3 * k))
            i += 3 * n
          }
          require(pal != null, "gif: no color table")
          val interlaced = (ip & 0x40) != 0
          val minCode = u8(i); i += 1
          // reassemble the LZW stream from length-prefixed sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (u8(i) != 0) {
            val n = u8(i)
            if (i + 1 + n > bytes.length)
              throw new IllegalArgumentException("gif: truncated sub-block")
            data.write(bytes, i + 1, n)
            i += 1 + n
          }
          val indices = lzw(data.toByteArray, minCode, w * h)
          val px = new Array[Int](w * h)
          if (!interlaced) {
            var k = 0
            while (k < w * h) { px(k) = pal(indices(k)); k += 1 }
          } else {
            // four-pass interlace: rows 0,8,16… then 4,12…, 2,6…, 1,3…
            val starts = Array(0, 4, 2, 1)
            val steps = Array(8, 8, 4, 2)
            var src = 0
            var p = 0
            while (p < 4) {
              var y = starts(p)
              while (y < h) {
                var x = 0
                while (x < w) { px(y * w + x) = pal(indices(src)); src += 1; x += 1 }
                y += steps(p)
              }
              p += 1
            }
          }
          return Decoded(w, h, px)
        case other =>
          throw new IllegalArgumentException(f"gif: unexpected block $other%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Variable-width LZW decode (GIF flavor): codes start at
    * minCode+1 bits, clear = 2^minCode, EOI = clear+1; the table grows
    * one entry per decoded code, widening at 2^width up to 12 bits
    * (then freezing until a clear — the deferred-clear rule).
    */
  private def lzw(data: Array[Byte], minCode: Int, expected: Int): Array[Int] = {
    require(minCode >= 1 && minCode <= 11, s"gif: bad LZW min code $minCode")
    val clear = 1 << minCode
    val eoi = clear + 1
    // table as (prefix code, appended index); roots are self-terminating
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var size = eoi + 1
    var width = minCode + 1
    val out = new Array[Int](expected)
    var outN = 0
    var bitPos = 0
    def read(): Int = {
      var v = 0
      var got = 0
      while (got < width) {
        val byte = bitPos >> 3
        if (byte >= data.length) return -1 // exhausted = implicit EOI
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, width - got)
        v |= (((data(byte) & 0xff) >> (bitPos & 7)) & ((1 << take) - 1)) << got
        got += take
        bitPos += take
      }
      v
    }
    def emit(code: Int): Int = { // writes the code's string, returns its first index
      var c = code
      var len = 0
      while (c >= clear) { len += 1; c = prefix(c) } // depth to the root
      val first = c
      var k = outN + len
      if (k >= expected)
        throw new IllegalArgumentException("gif: LZW output overruns raster")
      c = code
      while (c >= clear) { out(k) = append(c); k -= 1; c = prefix(c) }
      out(k) = c
      outN += len + 1
      first
    }
    var prev = -1
    var done = false
    while (!done && outN < expected) {
      val code = read()
      if (code < 0 || code == eoi) done = true
      else if (code == clear) {
        size = eoi + 1; width = minCode + 1; prev = -1
      } else if (prev < 0) {
        if (code >= clear)
          throw new IllegalArgumentException("gif: non-root code after clear")
        out(outN) = code; outN += 1; prev = code
      } else {
        if (code > size)
          throw new IllegalArgumentException("gif: LZW code out of range")
        val first =
          if (code == size) { // KwKwK: string = prev's string + its first index
            var c = prev
            while (c >= clear) c = prefix(c)
            if (size < 4096) { prefix(size) = prev; append(size) = c; size += 1 }
            emit(size - 1)
          } else {
            val f = emit(code)
            if (size < 4096) { prefix(size) = prev; append(size) = f; size += 1 }
            f
          }
        val _ = first
        prev = code
        if (size < 4096 && size >= (1 << width) && width < 12) width += 1
      }
    }
    if (outN != expected)
      throw new IllegalArgumentException(
        s"gif: LZW produced $outN of $expected pixels")
    out
  }

  def meanPixel(d: Decoded): Double = {
    var sum = 0L
    var i = 0
    while (i < d.pixels.length) { sum += d.pixels(i); i += 1 }
    sum.toDouble / d.pixels.length
  }
}
