package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Lossy VP8 decoder verification against the canonical second
  * implementation: every fixture in src/test/resources/vp8 was encoded
  * by the system libwebp (scripts/gen_vp8_fixtures.py) and ships with
  * libwebp's OWN decode of that stream as Y/U/V planes. VP8 decode is
  * bit-exact by spec, so the comparison is PER-SAMPLE equality — no
  * tolerance band. A single wrong table byte, prediction formula, or
  * filter constant desynchronizes the boolean decoder or shifts a
  * plane and fails loudly.
  */
class Vp8Spec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val fixtures: Seq[(String, Int, Int, Int)] = {
    val fams = Seq("flat", "grad", "sine", "check", "rand", "blocks")
    val sizes = Seq((16, 16), (32, 32), (17, 9), (37, 21), (48, 80), (128, 96))
    val grid = for {
      f <- fams
      (w, h) <- sizes
      q <- if ((w, h) == ((32, 32)) || (w, h) == ((37, 21)))
        Seq(5, 25, 50, 75, 95) else Seq(25, 75)
    } yield (s"${f}_${w}x${h}_q$q", w, h, q)
    // mostly-flat frames with one busy corner: the encoder emits
    // per-MB skip flags (mb_no_coeff_skip) only when most MBs carry
    // no coefficients — the grid families never trigger it
    grid ++ Seq(("corner_128x96_q50", 128, 96, 50),
      ("corner_128x96_q75", 128, 96, 75), ("corner_64x64_q50", 64, 64, 50),
      // hand-assembled (libwebp-validated) streams exercising the
      // per-MB skip flag and the 2-token-partition layout, which
      // libwebp's simple-API encoder never emits here
      ("skip_16x16_q50", 16, 16, 50),
      ("multipart_16x32_q50", 16, 32, 50),
      // hand-assembled SIMPLE-filter streams (libwebp's encoder always
      // picks the normal filter): nonzero levels, hand-built
      // coefficients landing edge steps on near-threshold masks — the
      // corpus that catches a 4-too-large simple-filter limit. The _v2
      // stream sets frame-tag version=2 with an IDENTICAL payload: its
      // truth sidecar is byte-identical to the v0 one, pinning that the
      // filter choice follows the header bit, not the version bits.
      ("simplef_16x16_lv4", 16, 16, -1),
      ("simplef_32x32_lv10", 32, 32, -1),
      ("simplef_32x32_lv20s3", 32, 32, -1),
      ("simplef_v2_16x16_lv4", 16, 16, -1),
      // version=2 with the NORMAL-filter bit (gen_vp8_anim_fixtures):
      // a version-forces-simple rule would filter this wrongly
      ("normalf_v2_16x16_lv16", 16, 16, -1),
      // loop-filter delta section (no encoded corpus enables it):
      // refLfDelta[INTRA] on the DC path, plus modeLfDelta[0] via a
      // hand-assembled all-B_DC B_PRED macroblock
      ("lfdelta_16x16_lv20", 16, 16, -1),
      ("lfdelta_bpred_16x16_lv12", 16, 16, -1))
  }

  for ((name, w, h, _) <- fixtures) {
    test(s"libwebp-encoded $name decodes sample-exactly (Y, U and V)") {
      val webp = resource(s"$name.webp")
      val truth = resource(s"$name.yuv")
      val d = Vp8Decode.decode(webp)
      assert(d.width == w && d.height == h, s"dims ${d.width}x${d.height}")
      val cw = (w + 1) / 2
      val ch = (h + 1) / 2
      assert(truth.length == w * h + 2 * cw * ch, "truth plane sizes")
      val ty = truth.slice(0, w * h)
      val tu = truth.slice(w * h, w * h + cw * ch)
      val tv = truth.slice(w * h + cw * ch, truth.length)
      def check(plane: String, a: Array[Byte], b: Array[Byte], sw: Int): Unit = {
        assert(a.length == b.length, s"$plane length")
        val diffs = a.indices.count(i => a(i) != b(i))
        a.indices.find(i => a(i) != b(i)).foreach { i =>
          fail(s"$plane: $diffs/${a.length} samples differ, first at " +
            s"(${i % sw},${i / sw}): got ${a(i) & 0xff} want ${b(i) & 0xff}")
        }
      }
      check("Y", d.y, ty, w)
      check("U", d.u, tu, cw)
      check("V", d.v, tv, cw)
    }
  }

  test("fixture corpus exercises every decoder path (no untested table)") {
    var yModes = Set.empty[Int]
    var bModes = Set.empty[Int]
    var uvModes = Set.empty[Int]
    var cats = Set.empty[Int]
    var segs = Set.empty[Int]
    var filters = Set.empty[Int]
    var anySkip = false
    var anyUpdates = false
    var anyLfDeltas = false
    for ((name, _, _, _) <- fixtures) {
      val (_, st) = Vp8Decode.decodeWithStats(resource(s"$name.webp"))
      yModes ++= st.yModes; bModes ++= st.bModes; uvModes ++= st.uvModes
      cats ++= st.tokenCats; segs ++= st.segments
      filters += st.filterType
      anySkip ||= st.skippedMbs > 0
      anyUpdates ||= st.probUpdates > 0
      anyLfDeltas ||= st.lfDeltas
    }
    assert(yModes == Set(0, 1, 2, 3, 4), s"Y modes seen: $yModes")
    assert(bModes == (0 to 9).toSet, s"B modes seen: $bModes")
    assert(uvModes.size >= 3, s"UV modes seen: $uvModes")
    // token categories 0..8: 1, 2, 3/4, cat1..cat6
    assert(cats.size >= 8, s"token categories seen: $cats")
    assert(segs.size >= 2, "segmentation never exercised")
    assert(anySkip, "skip flag never exercised")
    assert(anyUpdates, "token prob updates never exercised")
    assert(anyLfDeltas, "loop-filter delta path never exercised")
    // BOTH deblocking filters must be exercised (the r17 simple-filter
    // threshold bug shipped precisely because `filters` was collected
    // but never asserted and no fixture selected type 1)
    assert(filters == Set(0, 1), s"filter types seen: $filters")
    // the hand-assembled stream must actually take the 2-partition path
    val (_, mp) = Vp8Decode.decodeWithStats(resource("multipart_16x32_q50.webp"))
    assert(mp.numPartitions == 2, s"numPartitions ${mp.numPartitions}")
    // the B_PRED lf-delta stream must actually take BOTH delta adds
    // (ymode B_PRED = 4 -> modeLfDelta applies on keyframes)
    val (_, ld) = Vp8Decode.decodeWithStats(
      resource("lfdelta_bpred_16x16_lv12.webp"))
    assert(ld.lfDeltas && ld.yModes.contains(4),
      s"lfdelta_bpred: lfDeltas=${ld.lfDeltas} yModes=${ld.yModes}")
    // the simple-filter fixtures must take type 1 WITH a nonzero level
    for (n <- Seq("simplef_16x16_lv4", "simplef_32x32_lv10",
        "simplef_32x32_lv20s3", "simplef_v2_16x16_lv4")) {
      val (_, st) = Vp8Decode.decodeWithStats(resource(s"$n.webp"))
      assert(st.filterType == 1, s"$n filterType ${st.filterType}")
      assert(st.filterLevels.exists(_ > 0), s"$n filter levels all zero")
    }
  }

  private val alphaFixtures: Seq[(String, Int, Int)] = {
    val natural = for {
      p <- Seq("mix", "blocky"); (w, h) <- Seq((32, 32), (37, 21))
    } yield (s"alpha_${p}_${w}x$h", w, h)
    // hand-muxed raw-compression variants: one per filter method
    val raw = for {
      p <- Seq("mix", "blocky"); (w, h) <- Seq((32, 32), (37, 21))
      f <- 0 to 3
    } yield (s"alpha_${p}_${w}x${h}_raw_f$f", w, h)
    natural ++ raw
  }

  for ((name, w, h) <- alphaFixtures) {
    test(s"ALPH fixture $name decodes alpha sample-exactly (and Y unchanged)") {
      val webp = resource(s"$name.webp")
      val truth = resource(s"$name.alpha")
      val (yuv, alpha) = Vp8Decode.decodeWithAlphaPlane(webp)
      assert(yuv.width == w && yuv.height == h)
      assert(alpha.isDefined, "expected an ALPH plane")
      val a = alpha.get
      assert(a.length == w * h && truth.length == w * h)
      a.indices.find(i => a(i) != truth(i)).foreach { i =>
        fail(s"alpha diff at (${i % w},${i / w}): got ${a(i) & 0xff} " +
          s"want ${truth(i) & 0xff}")
      }
      // plain decode() still works on alpha containers (sidecar skipped)
      val plain = Vp8Decode.decode(webp)
      assert(plain.y.sameElements(yuv.y))
    }
  }

  test("ALPH rejection: reserved compression and short raw payloads") {
    val good = resource("alpha_mix_32x32_raw_f0.webp")
    // find the ALPH chunk
    var i = 12
    def tag(p: Int) = new String(good, p, 4, "US-ASCII")
    def sz(p: Int) = (good(p + 4) & 0xff) | ((good(p + 5) & 0xff) << 8) |
      ((good(p + 6) & 0xff) << 16) | ((good(p + 7) & 0xff) << 24)
    while (tag(i) != "ALPH") i += 8 + sz(i) + (sz(i) & 1)
    val bad = good.clone()
    bad(i + 8) = (bad(i + 8) | 3).toByte // compression = 3 (reserved)
    val e = intercept[IllegalArgumentException] {
      Vp8Decode.decodeWithAlphaPlane(bad)
    }
    assert(e.getMessage.contains("reserved compression"), e.getMessage)
  }

  test("truncation fuzz: every prefix either rejects or decodes without crash") {
    // the RFC §7 bool decoder pads zeros past the end by design (no
    // in-band terminator), so a mid-partition truncation may decode to
    // garbage pixels rather than throw — the contract here is
    // NO CRASH and NO HANG at any cut point, with header/size cuts
    // rejecting loudly
    val good = resource("grad_32x32_q50.webp")
    var threw = 0
    var decoded = 0
    var cut = 12
    while (cut < good.length) {
      try {
        val d = Vp8Decode.decode(good.take(cut))
        assert(d.width == 32 && d.height == 32)
        decoded += 1
      } catch {
        case _: IllegalArgumentException | _: IllegalStateException => threw += 1
      }
      cut += 7
    }
    // structural cuts (container/header/partition sizes) must reject
    assert(threw > 0, "no truncation ever rejected")
    assert(threw + decoded == (good.length - 12 + 6) / 7)
  }

  test("corrupt and out-of-subset VP8 streams reject loudly") {
    val good = resource("grad_32x32_q50.webp")
    intercept[IllegalArgumentException] {
      Vp8Decode.decode("nope".getBytes("US-ASCII"))
    }
    // truncated payload
    intercept[Exception] { Vp8Decode.decode(good.take(good.length / 3)) }
    // bad start code
    val bad = good.clone()
    bad(23) = 0x42 // offset 20 (payload) + 3 = start code byte
    val e = intercept[IllegalArgumentException] { Vp8Decode.decode(bad) }
    assert(e.getMessage.contains("start code"), e.getMessage)
    // interframe flag rejects (still WebP must be a keyframe)
    val inter = good.clone()
    inter(20) = (inter(20) | 1).toByte
    val e2 = intercept[IllegalArgumentException] { Vp8Decode.decode(inter) }
    assert(e2.getMessage.contains("key frame"), e2.getMessage)
    // VP8L routes to the lossless decoder, not here
    val l = MultimodalOps.MediaCodec.encodeWebpLossless(
      Array.fill(16 * 16)(0xff808080), 16, 16)
    val e3 = intercept[IllegalArgumentException] { Vp8Decode.decode(l) }
    assert(e3.getMessage.contains("VP8L"), e3.getMessage)
  }

  // YUV->ARGB kernel pin: uniform-chroma sweep (chroma constant => the
  // implementation-defined fancy upsampler in libwebp is the identity,
  // so WebPDecodeRGBA's committed output isolates the fixed-point
  // conversion kernel — every coefficient and both clip directions)
  private val argbSweep = Seq("argb_16x16_u0_v0", "argb_16x16_um60_v0",
    "argb_16x16_u0_vm60", "argb_16x16_u40_v40", "argb_16x16_um40_v60",
    "argb_16x16_u80_vm80", "argb_16x16_u25_vm25", "argb_16x16_um80_v80")

  for (name <- argbSweep) {
    test(s"yuvToArgb matches libwebp's RGBA decode on $name") {
      val d = Vp8Decode.decode(resource(s"$name.webp"))
      val truth = resource(s"$name.argb") // raw RGBA bytes
      val got = Vp8Decode.yuvToArgb(d)
      assert(truth.length == got.length * 4)
      got.indices.find { i =>
        ((got(i) >>> 16) & 0xff) != (truth(4 * i) & 0xff) ||
          ((got(i) >>> 8) & 0xff) != (truth(4 * i + 1) & 0xff) ||
          (got(i) & 0xff) != (truth(4 * i + 2) & 0xff) ||
          ((got(i) >>> 24) & 0xff) != (truth(4 * i + 3) & 0xff)
      }.foreach { i =>
        fail(f"argb diff at (${i % d.width},${i / d.width}): " +
          f"got ${got(i)}%08x want A=${truth(4 * i + 3) & 0xff} " +
          f"R=${truth(4 * i) & 0xff} G=${truth(4 * i + 1) & 0xff} " +
          f"B=${truth(4 * i + 2) & 0xff}")
      }
    }
  }

  // animated WebP with LOSSY frames (r18): mixed VP8 / VP8+ALPH / VP8L
  // payloads, rect offsets, dispose-to-background, fractional alpha
  // blending. Truth: libwebp's still decode of each frame payload,
  // composed by the generator's INDEPENDENT Python replay of the
  // container-spec src-over-dst composition.
  private val animFixtures = Seq(
    ("animv0_32x32_f3", 32, 32, 3), ("animv1_32x32_f2", 32, 32, 2),
    ("animv2_32x32_f4", 32, 32, 4), ("animv3_16x16_f2", 16, 16, 2))

  for ((name, w, h, nf) <- animFixtures) {
    test(s"lossy-frame animation $name composes canvas-exactly") {
      val anim = WebpDecode.decodeAnim(resource(s"$name.webp"))
      val truth = resource(s"$name.canvases") // per-frame RGBA, frame-major
      assert((anim.width, anim.height, anim.frames.length) == (w, h, nf))
      assert(truth.length == nf * w * h * 4)
      for (f <- 0 until nf) {
        val cv = anim.canvases(f)
        val base = f * w * h * 4
        cv.indices.find { i =>
          ((cv(i) >>> 16) & 0xff) != (truth(base + 4 * i) & 0xff) ||
            ((cv(i) >>> 8) & 0xff) != (truth(base + 4 * i + 1) & 0xff) ||
            (cv(i) & 0xff) != (truth(base + 4 * i + 2) & 0xff) ||
            ((cv(i) >>> 24) & 0xff) != (truth(base + 4 * i + 3) & 0xff)
        }.foreach { i =>
          fail(f"$name frame $f diff at (${i % w},${i / w}): " +
            f"got ${cv(i)}%08x want A=${truth(base + 4 * i + 3) & 0xff} " +
            f"R=${truth(base + 4 * i) & 0xff} " +
            f"G=${truth(base + 4 * i + 1) & 0xff} " +
            f"B=${truth(base + 4 * i + 2) & 0xff}")
        }
      }
    }
  }

  test("anim truncation fuzz: every prefix rejects or decodes, never crashes") {
    // the mixed-payload container (VP8L + VP8 + ALPH frames): cuts land
    // in the RIFF walk, ANMF headers, ALPH payloads and both codecs'
    // entropy-coded bodies. Bool/bit readers pad or reject by design;
    // the contract is NO CRASH and NO HANG at any cut point
    val good = resource("animv2_32x32_f4.webp")
    var threw = 0
    var decoded = 0
    var cut = 12
    while (cut < good.length) {
      try {
        val a = WebpDecode.decodeAnim(good.take(cut))
        assert(a.width == 32 && a.height == 32)
        decoded += 1
      } catch {
        case _: IllegalArgumentException | _: IllegalStateException => threw += 1
      }
      cut += 5
    }
    assert(threw > 0, "no truncation ever rejected")
    assert(threw + decoded == (good.length - 12 + 4) / 5)
  }

  test("anim rejections: ALPH before VP8L, unknown payload fourCC") {
    val good = resource("animv1_32x32_f2.webp") // frame 1 carries ALPH+VP8
    def sz(b: Array[Byte], p: Int) = (b(p + 4) & 0xff) |
      ((b(p + 5) & 0xff) << 8) | ((b(p + 6) & 0xff) << 16) |
      ((b(p + 7) & 0xff) << 24)
    def findChunk(b: Array[Byte], cc: String, from: Int): Int = {
      var i = from
      while (new String(b, i, 4, "US-ASCII") != cc) {
        // descend INTO ANMF frame bodies (16-byte header, then chunks)
        if (new String(b, i, 4, "US-ASCII") == "ANMF") i += 24
        else i += 8 + sz(b, i) + (sz(b, i) & 1)
      }
      i
    }
    // corrupt the VP8 fourCC following the ALPH chunk -> unknown payload
    val alphAt = findChunk(good, "ALPH", 30)
    val vp8At = findChunk(good, "VP8 ", alphAt)
    val badCc = good.clone()
    badCc(vp8At + 3) = 'Z'.toByte
    val e = intercept[IllegalArgumentException] { WebpDecode.decodeAnim(badCc) }
    assert(e.getMessage.contains("out of subset"), e.getMessage)
    // ALPH+VP8L is a spec violation (lossless carries its own alpha)
    val v2 = resource("animv2_32x32_f4.webp") // frame 0 payload is VP8L
    val l0 = findChunk(v2, "VP8L", 30)
    // splice: insert a minimal ALPH chunk before the VP8L payload
    val alph = Array[Byte]('A', 'L', 'P', 'H', 2, 0, 0, 0, 0, 0)
    val spliced = new Array[Byte](v2.length + alph.length)
    System.arraycopy(v2, 0, spliced, 0, l0)
    System.arraycopy(alph, 0, spliced, l0, alph.length)
    System.arraycopy(v2, l0, spliced, l0 + alph.length, v2.length - l0)
    // fix the RIFF and enclosing ANMF sizes
    def putSz(b: Array[Byte], p: Int, v: Int): Unit = {
      b(p + 4) = (v & 0xff).toByte; b(p + 5) = ((v >> 8) & 0xff).toByte
      b(p + 6) = ((v >> 16) & 0xff).toByte; b(p + 7) = ((v >> 24) & 0xff).toByte
    }
    putSz(spliced, 0, sz(v2, 0) + alph.length) // RIFF size lives at offset 4
    val anmfAt = findChunk(v2, "ANMF", 30)
    putSz(spliced, anmfAt, sz(v2, anmfAt) + alph.length)
    val e2 = intercept[IllegalArgumentException] {
      WebpDecode.decodeAnim(spliced)
    }
    assert(e2.getMessage.contains("may not accompany"), e2.getMessage)
  }
}
