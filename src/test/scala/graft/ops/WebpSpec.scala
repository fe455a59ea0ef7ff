package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch VP8L (lossless WebP) decoder vs the SYSTEM libwebp (an
  * independent canonical implementation): every fixture under
  * src/test/resources/webp/ was encoded by libwebp from a raw RGBA
  * raster (scripts/gen_webp_fixtures.py), so decode must reproduce
  * that raster BYTE-EXACTLY — across 8 content families chosen to
  * exercise every decoder path (gradient → predictor transform,
  * low-color → palette + pixel bundling, 150-color → palette without
  * bundling, tiled → 2D-mapped LZ77 backrefs, constant → long
  * backrefs/cache, random with alpha → entropy + color cache, …) at
  * 5 sizes incl. 1×1. Plus the loud-rejection contract.
  */
class WebpSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webp/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private val families =
    Seq("gray", "color", "pal4", "pal150", "rand", "tile", "const", "grad")
  private val sizes = Seq((1, 1), (3, 2), (17, 9), (64, 48), (200, 131))
  private val fixtures =
    (for (f <- families; (w, h) <- sizes) yield (f, w, h)) :+
      (("mixed", 320, 240)) :+ (("predmodes", 37, 21))

  for ((f, w, h) <- fixtures) {
    test(s"libwebp-encoded $f ${w}x$h decodes byte-exactly") {
      val webp = resource(s"${f}_${w}x$h.webp")
      val expected = resource(s"${f}_${w}x$h.rgba")
      val d = WebpDecode.decode(webp)
      assert((d.width, d.height) == (w, h))
      val got = WebpDecode.toRgba(d)
      assert(got.length == expected.length)
      var i = 0
      while (i < got.length) {
        assert(got(i) == (expected(i) & 0xff),
          s"$f ${w}x$h byte $i (pixel ${i / 4} ch ${i % 4}): " +
            s"got ${got(i)} want ${expected(i) & 0xff}")
        i += 1
      }
    }
  }

  test("the fixture corpus exercises every decoder path (no untested table)") {
    // aggregate decode stats across all fixtures: each FEATURE must be
    // hit somewhere, or the corresponding machinery (the 120-entry 2D
    // distance map, a predictor mode, the color cache, meta tiling,
    // palette bundling) would pass the suite untested
    var transforms = Set.empty[Int]
    var cacheHits = 0L
    var b2d = 0L
    var bLin = 0L
    var maxMeta = 1
    var predModes = Set.empty[Int]
    for ((f, w, h) <- fixtures) {
      val (_, st) = WebpDecode.decodeWithStats(resource(s"${f}_${w}x$h.webp"))
      transforms ++= st.transforms
      cacheHits += st.cacheHits
      b2d += st.backrefs2d
      bLin += st.backrefsLinear
      maxMeta = math.max(maxMeta, st.metaGroups)
      predModes ++= st.predictorModes
    }
    assert(transforms == Set(0, 1, 2, 3),
      s"fixtures miss transform types: ${Set(0, 1, 2, 3) -- transforms}")
    assert(cacheHits > 0, "no fixture used the color cache")
    assert(b2d > 0, "no fixture used 2D-mapped backward references")
    assert(bLin > 0, "no fixture used linear (plane-code>120) distances")
    assert(maxMeta > 1, "no fixture used meta prefix-code tiling")
    assert(predModes == (0 until 14).toSet,
      s"fixtures miss predictor modes ${(0 until 14).toSet -- predModes} " +
        "(predmodes_37x21 hand-assembles all 14 with libwebp's decode as truth)")
    info(s"coverage: transforms=$transforms cacheHits=$cacheHits " +
      s"backrefs2d=$b2d linear=$bLin maxMetaGroups=$maxMeta predModes=$predModes")
  }

  test("own-encoder round-trip: encodeWebpLossless streams decode pixel-exact") {
    // the own encoder's streams are ALSO validated against the system
    // libwebp decoder (scripts/gen_webp_fixtures.py --check-own on
    // DumpOwnWebp's dump — 24/24 byte-exact, r16); here we pin the
    // in-JVM round-trip incl. varying alpha and the 1x1 edge
    import MultimodalOps.MediaCodec
    for ((w, h) <- Seq((1, 1), (5, 3), (16, 32), (64, 80))) {
      val raster = Array.tabulate(w * h) { i =>
        val (r, g, b) = MediaCodec.pixelRgb(13L, i % w, i / w)
        ((128 + ((i * 7) % 128)) << 24) | (r << 16) | (g << 8) | b
      }
      val d = WebpDecode.decode(MediaCodec.encodeWebpLossless(raster, w, h))
      assert((d.width, d.height) == (w, h))
      assert(d.argb.sameElements(raster), s"own round-trip ${w}x$h")
    }
  }

  test("mm_webp_decode row: exact means on every image doc") {
    val spark = graft.Sessions.build("local[4]", "4")
    import MultimodalOps.MediaCodec
    val rows = SparkEntryAccess.query("mm_webp_decode")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((16 * (id % 4 + 1)).toInt, (16 * (id % 5 + 1)).toInt)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      var sg = 0L; var sc = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sg += MediaCodec.pixel(id, x, y)
        val (a, b, c) = MediaCodec.pixelRgb(id, x, y)
        sc += a + b + c
      }
      assert(r.getDouble(3) == sg.toDouble / (w * h), s"doc $id gray mean")
      assert(r.getDouble(4) == sc.toDouble / (3L * w * h), s"doc $id rgb mean")
    }
  }

  test("animated WebP: own-muxed full-frame animation composes per-frame exact") {
    import MultimodalOps.MediaCodec
    val (docId, w, h, nf) = (9L, 16, 32, 4)
    val anim = WebpDecode.decodeAnim(MediaCodec.encodeWebpAnim(docId, w, h, nf))
    assert((anim.width, anim.height, anim.frames.length) == (w, h, nf))
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
      val v = MediaCodec.pixel(docId + f, x, y)
      val p = anim.canvases(f)(y * w + x)
      assert(((p >>> 8) & 0xff) == v && ((p >>> 24) & 0xff) == 255,
        s"frame $f ($x,$y)")
    }
  }

  test("animated WebP: hand-assembled rects, dispose-to-background, alpha blending") {
    import MultimodalOps.MediaCodec
    // canvas 8x6; frame0: full canvas opaque red (overwrite, dispose to
    // GREEN background); frame1: 4x2 rect at (2,2) opaque blue,
    // ALPHA-BLEND (alpha 255 => overwrite within rect), no dispose;
    // frame2: 2x2 rect at (0,0) FULLY TRANSPARENT, alpha-blend (=> canvas
    // unchanged there — a no-blend encoder would punch a hole)
    val bos = new java.io.ByteArrayOutputStream()
    def u24(v: Int): Unit = (0 until 3).foreach(s => bos.write((v >> (8 * s)) & 0xff))
    def le32(v: Int): Unit = (0 until 4).foreach(s => bos.write((v >> (8 * s)) & 0xff))
    def cc(t: String): Unit = bos.write(t.getBytes("US-ASCII"))
    val (cw, chh) = (8, 6)
    cc("VP8X"); le32(10); bos.write(2); bos.write(0); bos.write(0); bos.write(0)
    u24(cw - 1); u24(chh - 1)
    // background = GREEN opaque: stored B,G,R,A
    cc("ANIM"); le32(6)
    bos.write(0); bos.write(255); bos.write(0); bos.write(255)
    bos.write(0); bos.write(0)
    def anmf(x: Int, y: Int, fw: Int, fh: Int, flags: Int, argb: Array[Int]): Unit = {
      val pl = MediaCodec.vp8lPayload(argb, fw, fh)
      val inner = 8 + pl.length + (pl.length & 1)
      cc("ANMF"); le32(16 + inner)
      u24(x / 2); u24(y / 2); u24(fw - 1); u24(fh - 1); u24(30); bos.write(flags)
      cc("VP8L"); le32(pl.length); bos.write(pl)
      if ((pl.length & 1) == 1) bos.write(0)
    }
    val red = 0xffff0000
    val blue = 0xff0000ff
    anmf(0, 0, cw, chh, 0x03, Array.fill(cw * chh)(red)) // overwrite + dispose-to-bg
    anmf(2, 2, 4, 2, 0x00, Array.fill(8)(blue))          // blend, no dispose
    anmf(0, 0, 2, 2, 0x00, Array.fill(4)(0))             // transparent, blend
    val body = bos.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    (0 until 4).foreach(s => out.write(((4 + body.length) >> (8 * s)) & 0xff))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(body)
    val anim = WebpDecode.decodeAnim(out.toByteArray)
    val green = 0xff00ff00
    assert(anim.background == green)
    // canvas 0: all red
    assert(anim.canvases(0).forall(_ == red))
    // canvas 1: frame0 DISPOSED to green background, then blue rect
    for (y <- 0 until chh; x <- 0 until cw) {
      val want = if (y >= 2 && y < 4 && x >= 2 && x < 6) blue else green
      assert(anim.canvases(1)(y * cw + x) == want, s"canvas1 ($x,$y)")
    }
    // canvas 2: unchanged (transparent blend is a no-op)
    assert(anim.canvases(2).sameElements(anim.canvases(1)))
    // rejection: a static decode must NOT accept the animation
    val e = intercept[IllegalArgumentException] {
      WebpDecode.decode(out.toByteArray)
    }
    assert(e.getMessage.contains("VP8X"), e.getMessage)
  }

  test("corrupt and out-of-subset WebP streams reject loudly") {
    val good = resource("gray_17x9.webp")
    // not RIFF
    intercept[IllegalArgumentException] {
      WebpDecode.decode("nope".getBytes("US-ASCII"))
    }
    // truncation inside the VP8L payload
    intercept[IllegalArgumentException] {
      WebpDecode.decode(good.take(good.length / 2))
    }
    // lossy VP8 chunk rejects by fourCC
    val lossy = good.clone()
    lossy(15) = ' '.toByte // "VP8L" -> "VP8 "
    val e = intercept[IllegalArgumentException] { WebpDecode.decode(lossy) }
    assert(e.getMessage.contains("lossy"), e.getMessage)
    // VP8X extended container rejects
    val vp8x = good.clone()
    vp8x(15) = 'X'.toByte
    val e2 = intercept[IllegalArgumentException] { WebpDecode.decode(vp8x) }
    assert(e2.getMessage.contains("VP8X"), e2.getMessage)
    // bad VP8L signature byte
    val badSig = good.clone()
    badSig(20) = 0x42
    val e3 = intercept[IllegalArgumentException] { WebpDecode.decode(badSig) }
    assert(e3.getMessage.contains("signature"), e3.getMessage)
  }

  test("VP8X still walk: metadata chunks round-trip; flag mismatches reject") {
    val (w, h) = (32, 16)
    val bytes = MultimodalOps.MediaCodec.encodeWebpVp8x(7L, w, h)
    val v = WebpDecode.vp8xStill(bytes)
    assert(v.canvasWidth == w && v.canvasHeight == h)
    assert(v.hasIcc && v.hasExif && v.hasXmp && !v.hasAlpha)
    // EXIF payload parses with the same TIFF-IFD codec the JPEG family uses
    val e = ExifCodec.decode(v.exif.get)
    assert(e.make == "cam2" && e.orientation == 8 && e.iso == 800)
    assert(e.width == w && e.height == h)
    assert(v.icc.get.length == (7 % 64 + 16) && v.xmp.get.length == 20)
    // the wrapped VP8L still decodes pixel-exact through the container
    for (y <- 0 until h; x <- 0 until w) {
      val exp = MultimodalOps.MediaCodec.pixel(7L, x, y)
      val got = (v.still.argb(y * w + x) >>> 8) & 0xff
      assert(got == exp, s"pixel ($x,$y)")
    }
    // decode() routes VP8X stills to the same pixels
    val viaDecode = WebpDecode.decode(bytes)
    assert(viaDecode.argb.sameElements(v.still.argb))
    // dims() reads the canvas straight off the VP8X header
    assert(WebpDecode.dims(bytes) == ((w, h)))
    // animated flag routes away from the still walk
    val anim = bytes.clone()
    anim(20) = (anim(20) | 0x02).toByte
    val ea = intercept[IllegalArgumentException] { WebpDecode.vp8xStill(anim) }
    assert(ea.getMessage.contains("decodeAnim"), ea.getMessage)
    // EXIF flag set but chunk renamed away → flag/chunk mismatch rejects
    val noExif = bytes.clone()
    val exifAt = {
      var i = 30
      def tag(p: Int) = new String(noExif, p, 4, "US-ASCII")
      def sz(p: Int) = (noExif(p + 4) & 0xff) | ((noExif(p + 5) & 0xff) << 8) |
        ((noExif(p + 6) & 0xff) << 16) | ((noExif(p + 7) & 0xff) << 24)
      while (tag(i) != "EXIF") i += 8 + sz(i) + (sz(i) & 1)
      i
    }
    noExif(exifAt) = 'J'.toByte // "EXIF" -> "JXIF": unknown chunk, skipped
    val em = intercept[IllegalArgumentException] { WebpDecode.vp8xStill(noExif) }
    assert(em.getMessage.contains("EXIF flag/chunk mismatch"), em.getMessage)
    // lossy VP8 payload inside VP8X stays out of subset
    val lossy = bytes.clone()
    val vp8lAt = {
      var i = 30
      def tag(p: Int) = new String(lossy, p, 4, "US-ASCII")
      def sz(p: Int) = (lossy(p + 4) & 0xff) | ((lossy(p + 5) & 0xff) << 8) |
        ((lossy(p + 6) & 0xff) << 16) | ((lossy(p + 7) & 0xff) << 24)
      while (tag(i) != "VP8L") i += 8 + sz(i) + (sz(i) & 1)
      i
    }
    lossy(vp8lAt + 3) = ' '.toByte // "VP8L" -> "VP8 "
    val el = intercept[IllegalArgumentException] { WebpDecode.vp8xStill(lossy) }
    assert(el.getMessage.contains("lossy"), el.getMessage)
  }

  test("code-length repeat overrunning the alphabet rejects (no silent clamp)") {
    // hand-assembled 1x1 VP8L stream: four simple 1-symbol codes, then
    // a DISTANCE code (alphabet 40) in normal form whose first CL
    // symbol is 18 with 7 extra bits = 127 → repeat 138 zeros from
    // symbol 0. libwebp's ReadHuffmanCodeLengths errors on
    // symbol + repeat > num_symbols; a clamp here would quietly accept
    // an illegal stream.
    val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(v: Int, n: Int): Unit =
      (0 until n).foreach(i => bits += ((v >> i) & 1)) // LSB-first
    put(0x2f, 8); put(0, 14); put(0, 14); put(0, 1); put(0, 3) // header 1x1
    put(0, 1) // no transforms
    put(0, 1) // no color cache
    put(0, 1) // no meta prefix codes
    // green/red/blue/alpha: simple form, 1 symbol, 1-bit symbol 0
    (0 until 4).foreach { _ => put(1, 1); put(0, 1); put(0, 1); put(0, 1) }
    // distance code, normal form
    put(0, 1) // not simple
    put(0, 4) // numCl = 4 → ClOrder slots 17, 18, 0, 1
    put(0, 3) // len(17) = 0
    put(1, 3) // len(18) = 1
    put(1, 3) // len(0)  = 1
    put(0, 3) // len(1)  = 0
    put(0, 1) // no max_symbol cut
    // canonical over {0: len 1, 18: len 1}: code 1 → symbol 18
    put(1, 1)
    put(127, 7) // repeat = 11 + 127 = 138 ≫ alphabet 40
    val payload = bits.grouped(8)
      .map(g => g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte)
      .toArray
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(s => bos.write((v >> (8 * s)) & 0xff))
    bos.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + payload.length)
    bos.write("WEBP".getBytes("US-ASCII"))
    bos.write("VP8L".getBytes("US-ASCII")); le32(payload.length)
    bos.write(payload)
    val e = intercept[IllegalArgumentException] {
      WebpDecode.decode(bos.toByteArray)
    }
    assert(e.getMessage.contains("overruns alphabet"), e.getMessage)
  }
}
