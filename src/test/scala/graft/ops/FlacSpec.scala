package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** FLAC subset codec: lossless round trips across subframe/blocksize
  * shapes, spec test vectors for the CRCs, decoder breadth the encoder
  * never emits (partitioned Rice, escape codes, VERBATIM), and the
  * loud-rejection contract for corrupt and out-of-subset streams.
  */
class FlacSpec extends AnyFunSuite {

  private def noise(seed: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => ((seed * 1103515245L + i * 12345L) % 65536L - 32768L).toShort)

  test("CRC-8 and CRC-16 match published check values") {
    // "123456789" — CRC-8/ITU-T-poly(0x07,init 0) = 0xF4,
    // CRC-16/BUYPASS (poly 0x8005, init 0, MSB-first) = 0xFEE8
    val msg = "123456789".getBytes("US-ASCII")
    assert(FlacCodec.crc8(msg, 0, msg.length) == 0xf4)
    assert(FlacCodec.crc16(msg, 0, msg.length) == 0xfee8)
  }

  test("round trip is bit-exact across waveform shapes and blocksizes") {
    val shapes = Seq[(String, Array[Short])](
      ("white noise", noise(7L, 500)),
      ("constant", Array.fill(300)(1234.toShort)),
      ("silence", Array.fill(277)(0.toShort)),
      ("ramp (order-1 friendly)", Array.tabulate(513)(i => (i * 3 - 700).toShort)),
      ("parabola (order-2 friendly)",
        Array.tabulate(400)(i => ((i * i) / 8 - 9000).toShort)),
      ("full-scale square", Array.tabulate(256)(i =>
        (if (i % 2 == 0) Short.MaxValue else Short.MinValue))),
      ("single sample", Array[Short](-32768)),
      ("exact one block", noise(11L, 256)),
      ("block + 1", noise(13L, 257)))
    for ((label, pcm) <- shapes; bs <- Seq(64, 256); p <- Seq(0, 2)) {
      val enc = FlacCodec.encode(pcm, 8000, bs, partitionOrder = p)
      val dec = FlacCodec.decode(enc)
      assert(dec.sampleRate == 8000 && dec.channels == 1 && dec.bits == 16, label)
      assert(dec.nFrames == (pcm.length + bs - 1) / bs, s"$label bs=$bs")
      assert(dec.samples.sameElements(pcm), s"$label bs=$bs p=$p not lossless")
    }
  }

  test("compression is real on predictable signals") {
    val ramp = Array.tabulate(4096)(i => ((i % 1000) * 3).toShort)
    val enc = FlacCodec.encode(ramp)
    // raw PCM is 8192 bytes; an order-1/2 predictable ramp must beat 4x
    assert(enc.length < 2048,
      s"ramp should compress well below raw PCM: ${enc.length} vs 8192")
    // noise stays near raw size but must still round-trip
    val nz = noise(3L, 4096)
    val encN = FlacCodec.encode(nz)
    assert(FlacCodec.decode(encN).samples.sameElements(nz))
  }

  test("non-8kHz rates ride the follow-up header field and round-trip") {
    for (rate <- Seq(8000, 44100, 11025)) { // table code, table code, 16-bit field
      val pcm = noise(5L, 300)
      val dec = FlacCodec.decode(FlacCodec.encode(pcm, rate))
      assert(dec.sampleRate == rate)
      assert(dec.samples.sameElements(pcm))
    }
  }

  test("corrupt streams reject loudly — CRC/sync/MD5/magic") {
    val pcm = noise(9L, 400)
    val enc = FlacCodec.encode(pcm)
    intercept[IllegalArgumentException] {
      FlacCodec.decode("not flac".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { FlacCodec.decode(enc.take(30)) }
    // flip one bit inside the first frame's entropy data: either the
    // frame CRC-16 or the stream MD5 must catch it — never silence
    val headerEnd = 4 + 4 + 34
    for (victim <- Seq(headerEnd + 8, headerEnd + 20, enc.length - 3)) {
      val bad = enc.clone()
      bad(victim) = (bad(victim) ^ 0x10).toByte
      intercept[IllegalArgumentException] { FlacCodec.decode(bad) }
    }
    // truncated mid-frames
    intercept[IllegalArgumentException] { FlacCodec.decode(enc.take(enc.length - 5)) }
  }

  test("decoder breadth beyond the encoder: out-of-subset declarations reject") {
    val pcm = noise(1L, 256)
    val enc = FlacCodec.encode(pcm)
    // find the first frame: metadata is 4 + 4 + 34 bytes by construction
    val f0 = 4 + 4 + 34
    assert((enc(f0) & 0xff) == 0xff && (enc(f0 + 1) & 0xf8) == 0xf8, "frame sync")
    // channel assignment nibble lives in byte f0+3 (upper 4 bits).
    // r15: stereo IS decodable now — a stereo frame inside a mono
    // stream must reject as a STREAMINFO mismatch (or CRC, whichever
    // trips first), never decode silently
    val stereo = enc.clone()
    stereo(f0 + 3) = ((stereo(f0 + 3) & 0x0f) | 0x10).toByte // 2 channels
    val e1 = intercept[IllegalArgumentException] { FlacCodec.decode(stereo) }
    assert(e1.getMessage.contains("STREAMINFO has") ||
      e1.getMessage.contains("CRC"), e1.getMessage)
    // 3+ independent channels stay out of subset
    val triple = enc.clone()
    triple(f0 + 3) = ((triple(f0 + 3) & 0x0f) | 0x20).toByte // 3 channels
    val e2 = intercept[IllegalArgumentException] { FlacCodec.decode(triple) }
    assert(e2.getMessage.contains("out of subset") ||
      e2.getMessage.contains("CRC"), e2.getMessage)
  }

  test("hand-assembled stream: rice2 params, escape partitions, VERBATIM subframe") {
    // paths a real FLAC file may carry but our encoder never emits:
    // residual method 1 (5-bit params), partition order 2, the
    // escape-to-raw partition code, and a VERBATIM subframe — built
    // bit by bit here and required to decode sample-exact
    final class BW {
      val out = new java.io.ByteArrayOutputStream()
      private var acc = 0; private var n = 0
      def put(v: Long, bits: Int): Unit = {
        var i = bits - 1
        while (i >= 0) {
          acc = (acc << 1) | ((v >> i) & 1L).toInt; n += 1
          if (n == 8) { out.write(acc); acc = 0; n = 0 }
          i -= 1
        }
      }
      def unary(q: Int): Unit = { (0 until q).foreach(_ => put(0, 1)); put(1, 1) }
      def alignZero(): Unit = if (n > 0) put(0, 8 - n)
      def bytes: Array[Byte] = { require(n == 0); out.toByteArray }
    }
    def zig(v: Int): Long = if (v >= 0) v.toLong << 1 else ((-v).toLong << 1) - 1
    val bs = 32
    // frame 0: FIXED order 1 over a drifting signal
    val res = Array.tabulate(bs - 1)(i => (i % 7) - 3) // residuals, order 1
    val x0 = new Array[Int](bs)
    x0(0) = 1000
    for (i <- 1 until bs) x0(i) = x0(i - 1) + res(i - 1)
    // frame 1: arbitrary verbatim samples
    val x1 = Array.tabulate(bs)(i => (i * 997 % 40000) - 20000)
    val total = 2 * bs

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new BW
    si.put(bs, 16); si.put(bs, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(0, 3); si.put(15, 5); si.put(total.toLong, 36)
    (0 until 16).foreach(_ => si.put(0, 8)) // md5 unknown (all zero)
    val sib = si.bytes
    out.write(0x80); out.write(0); out.write(0); out.write(sib.length)
    out.write(sib, 0, sib.length)

    def frame(idx: Int)(body: BW => Unit): Unit = {
      val w = new BW
      w.put(0x3ffe, 14); w.put(0, 2)
      w.put(6, 4)  // blocksize: 8-bit field at end
      w.put(4, 4)  // 8 kHz
      w.put(0, 4); w.put(4, 3); w.put(0, 1)
      w.put(idx.toLong, 8) // UTF-8 coded number < 0x80
      w.put(bs - 1, 8)     // blocksize - 1
      val hdr = w.bytes
      val full = new BW
      hdr.foreach(b => full.put(b & 0xffL, 8))
      full.put(FlacCodec.crc8(hdr, 0, hdr.length).toLong, 8)
      body(full)
      full.alignZero()
      val fb = full.bytes
      out.write(fb, 0, fb.length)
      val c = FlacCodec.crc16(fb, 0, fb.length)
      out.write(c >> 8); out.write(c & 0xff)
    }
    frame(0) { w =>
      w.put(0, 1); w.put(9, 6); w.put(0, 1) // FIXED order 1
      w.put(x0(0).toLong & 0xffff, 16)      // warmup
      w.put(1, 2)                           // residual method 1: 5-bit params
      w.put(2, 4)                           // partition order 2 → 4 partitions
      // partitions of 8 samples (first has 8 - order = 7)
      val parts = Seq(res.slice(0, 7), res.slice(7, 15),
        res.slice(15, 23), res.slice(23, 31))
      val ks = Seq(2, 31, 0, 3) // 31 = 5-bit escape
      parts.zip(ks).foreach { case (p, k) =>
        w.put(k.toLong, 5)
        if (k == 31) {
          w.put(6, 5) // raw 6-bit signed residuals
          p.foreach(r => w.put(r.toLong & 0x3f, 6))
        } else p.foreach { r =>
          val u = zig(r)
          w.unary((u >> k).toInt)
          if (k > 0) w.put(u & ((1L << k) - 1), k)
        }
      }
    }
    frame(1) { w =>
      w.put(0, 1); w.put(1, 6); w.put(0, 1) // VERBATIM
      x1.foreach(v => w.put(v.toLong & 0xffff, 16))
    }
    val dec = FlacCodec.decode(out.toByteArray)
    assert(dec.nFrames == 2 && dec.samples.length == total)
    assert(dec.samples.take(bs).map(_.toInt).sameElements(x0), "FIXED/rice2/escape frame")
    assert(dec.samples.drop(bs).map(_.toInt).sameElements(x1), "VERBATIM frame")
  }

  test("hand-assembled LPC subframe + wasted bits decode sample-exact") {
    // an order-2 LPC subframe with a real quantization shift, and a
    // CONSTANT subframe with wasted bits — exactly what a libFLAC
    // stream carries and our encoder need not emit in this shape
    final class BW {
      val out = new java.io.ByteArrayOutputStream()
      private var acc = 0; private var n = 0
      def put(v: Long, bits: Int): Unit = {
        var i = bits - 1
        while (i >= 0) {
          acc = (acc << 1) | ((v >> i) & 1L).toInt; n += 1
          if (n == 8) { out.write(acc); acc = 0; n = 0 }
          i -= 1
        }
      }
      def unary(q: Int): Unit = { (0 until q).foreach(_ => put(0, 1)); put(1, 1) }
      def alignZero(): Unit = if (n > 0) put(0, 8 - n)
      def bytes: Array[Byte] = { require(n == 0); out.toByteArray }
    }
    def zig(v: Int): Long = if (v >= 0) v.toLong << 1 else ((-v).toLong << 1) - 1
    val bs = 32
    // frame 0: LPC order 2, prec 4 (coefs in [-8,7]), shift 1:
    // x(i) = res(i) + ((3·x(i-1) − 2·x(i-2)) >> 1)
    val coef = Array(3, -2)
    val res = Array.tabulate(bs - 2)(i => (i % 5) - 2)
    val x0 = new Array[Int](bs)
    x0(0) = 100; x0(1) = 102
    for (i <- 2 until bs)
      x0(i) = res(i - 2) + ((coef(0).toLong * x0(i - 1) + coef(1).toLong * x0(i - 2)) >> 1).toInt
    // frame 1: CONSTANT −42 with 1 wasted bit (all samples even: −84)
    val x1 = Array.fill(bs)(-84)
    val total = 2 * bs

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new BW
    si.put(bs, 16); si.put(bs, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(0, 3); si.put(15, 5); si.put(total.toLong, 36)
    (0 until 16).foreach(_ => si.put(0, 8))
    val sib = si.bytes
    out.write(0x80); out.write(0); out.write(0); out.write(sib.length)
    out.write(sib, 0, sib.length)
    def frame(idx: Int)(body: BW => Unit): Unit = {
      val w = new BW
      w.put(0x3ffe, 14); w.put(0, 2)
      w.put(6, 4); w.put(4, 4); w.put(0, 4); w.put(4, 3); w.put(0, 1)
      w.put(idx.toLong, 8); w.put(bs - 1, 8)
      val hdr = w.bytes
      val full = new BW
      hdr.foreach(b => full.put(b & 0xffL, 8))
      full.put(FlacCodec.crc8(hdr, 0, hdr.length).toLong, 8)
      body(full)
      full.alignZero()
      val fb = full.bytes
      out.write(fb, 0, fb.length)
      val c = FlacCodec.crc16(fb, 0, fb.length)
      out.write(c >> 8); out.write(c & 0xff)
    }
    frame(0) { w =>
      w.put(0, 1); w.put(32 + 1, 6); w.put(0, 1) // LPC order 2 (32 + o − 1)
      w.put(x0(0).toLong & 0xffff, 16)           // warmup
      w.put(x0(1).toLong & 0xffff, 16)
      w.put(3, 4)                                 // precision − 1 = 3
      w.put(1, 5)                                 // shift = 1
      coef.foreach(c => w.put(c.toLong & 0xf, 4))
      w.put(0, 2); w.put(0, 4); w.put(1, 4)       // method 0, 1 partition, k=1
      res.foreach { r =>
        val u = zig(r)
        w.unary((u >> 1).toInt); w.put(u & 1, 1)
      }
    }
    frame(1) { w =>
      w.put(0, 1); w.put(0, 6)      // CONSTANT
      w.put(1, 1); w.unary(0)        // wasted-bits flag, k−1=0 ⇒ 1 wasted bit
      w.put(-42L & 0x7fff, 15)       // value at bps−1 = 15 bits
    }
    val dec = FlacCodec.decode(out.toByteArray)
    assert(dec.nFrames == 2 && dec.samples.length == total)
    assert(dec.samples.take(bs).map(_.toInt).sameElements(x0), "LPC frame")
    assert(dec.samples.drop(bs).map(_.toInt).sameElements(x1), "wasted-bits frame")
  }

  test("encoder emits LPC on correlated signals and round-trips losslessly") {
    val pcm = Array.tabulate(1024)(i =>
      (8000 * math.sin(2 * math.Pi * i / 50)).toShort)
    val enc = FlacCodec.encode(pcm, 8000, 256)
    // first subframe header sits right after the 6-byte frame header
    // (4 fixed + 1 UTF-8 + 1 CRC-8 for bs=256/8kHz): [pad|type(6)|wasted]
    val subType = (enc(4 + 4 + 34 + 6) >> 1) & 0x3f
    assert(subType >= 32, s"sine should pick an LPC subframe, got type $subType")
    val dec = FlacCodec.decode(enc)
    assert(dec.samples.sameElements(pcm), "LPC round trip not lossless")
    // LPC must beat raw PCM (2 B/sample) decisively on a sine
    assert(enc.length < 2 * pcm.length * 3 / 4,
      s"weak compression: ${enc.length} vs raw ${2 * pcm.length}")
  }

  test("stereo: decorrelation modes picked per frame, interleaved PCM round-trips") {
    val n = 700
    def chNibble(enc: Array[Byte]): Int = (enc(4 + 4 + 34 + 3) >> 4) & 0xf
    // identical channels: side ≡ 0 ⇒ a decorrelated mode must win
    val l1 = noise(31L, n)
    val encSame = FlacCodec.encodeStereo(l1, l1)
    assert(Set(8, 9, 10).contains(chNibble(encSame)),
      s"identical channels should decorrelate, picked ${chNibble(encSame)}")
    val decSame = FlacCodec.decode(encSame)
    assert(decSame.channels == 2 && decSame.samples.length == 2 * n)
    for (i <- 0 until n) {
      assert(decSame.samples(2 * i) == l1(i) && decSame.samples(2 * i + 1) == l1(i))
    }
    // asymmetric channels (full-scale L, whisper R): any decorrelation
    // mixes L's magnitude into both subframes ⇒ independent wins
    // (full-scale INDEPENDENT noise, by contrast, legitimately favors
    // mid/side: the mid of two uniforms is triangular — ~1 bit cheaper)
    val r2 = Array.tabulate(n)(i => ((i * 7) % 7 - 3).toShort)
    val encInd = FlacCodec.encodeStereo(l1, r2)
    assert(chNibble(encInd) == 1,
      s"asymmetric channels should stay independent, picked ${chNibble(encInd)}")
    val decInd = FlacCodec.decode(encInd)
    for (i <- 0 until n) {
      assert(decInd.samples(2 * i) == l1(i) && decInd.samples(2 * i + 1) == r2(i))
    }
    // near-identical channels: small side ⇒ decorrelated again, and the
    // reconstruction is exact in ALL modes (lossless)
    val r3 = Array.tabulate(n)(i => (l1(i) + (i % 3) - 1).toShort)
    val encNear = FlacCodec.encodeStereo(l1, r3, 44100, 64, 2)
    assert(Set(8, 9, 10).contains(chNibble(encNear)))
    val decNear = FlacCodec.decode(encNear)
    assert(decNear.sampleRate == 44100)
    for (i <- 0 until n) {
      assert(decNear.samples(2 * i) == l1(i) && decNear.samples(2 * i + 1) == r3(i))
    }
    // integrity: a flipped byte in stereo entropy data still rejects
    val bad = encSame.clone()
    bad(bad.length - 40) = (bad(bad.length - 40) ^ 0x20).toByte
    intercept[IllegalArgumentException] { FlacCodec.decode(bad) }
  }

  test("STREAMINFO MD5 self-check catches a decoder that would lie") {
    val pcm = noise(21L, 350)
    val enc = FlacCodec.encode(pcm)
    // zero out the MD5 → decoder must SKIP the check (md5 unknown is
    // legal) and still round-trip
    val noMd5 = enc.clone()
    for (i <- 0 until 16) noMd5(4 + 4 + 18 + i) = 0
    assert(FlacCodec.decode(noMd5).samples.sameElements(pcm))
    // corrupt one MD5 byte → decode must fail the integrity check
    val badMd5 = enc.clone()
    badMd5(4 + 4 + 18) = (badMd5(4 + 4 + 18) ^ 0x55).toByte
    intercept[IllegalArgumentException] { FlacCodec.decode(badMd5) }
  }
}
