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
      ("multipart_16x32_q50", 16, 32, 50))
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
    for ((name, _, _, _) <- fixtures) {
      val (_, st) = Vp8Decode.decodeWithStats(resource(s"$name.webp"))
      yModes ++= st.yModes; bModes ++= st.bModes; uvModes ++= st.uvModes
      cats ++= st.tokenCats; segs ++= st.segments
      filters += st.filterType
      anySkip ||= st.skippedMbs > 0
      anyUpdates ||= st.probUpdates > 0
    }
    assert(yModes == Set(0, 1, 2, 3, 4), s"Y modes seen: $yModes")
    assert(bModes == (0 to 9).toSet, s"B modes seen: $bModes")
    assert(uvModes.size >= 3, s"UV modes seen: $uvModes")
    // token categories 0..8: 1, 2, 3/4, cat1..cat6
    assert(cats.size >= 8, s"token categories seen: $cats")
    assert(segs.size >= 2, "segmentation never exercised")
    assert(anySkip, "skip flag never exercised")
    assert(anyUpdates, "token prob updates never exercised")
    // the hand-assembled stream must actually take the 2-partition path
    val (_, mp) = Vp8Decode.decodeWithStats(resource("multipart_16x32_q50.webp"))
    assert(mp.numPartitions == 2, s"numPartitions ${mp.numPartitions}")
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
}
