package graft.ops

/** Baseline JPEG ENTROPY DECODER (ITU T.81 — SOF0 sequential DCT,
  * Huffman coding): the missing half of the compressed-codec family
  * beside [[MultimodalOps.MediaCodec.jpegDims]]'s header-only marker
  * walk. Implements the full §F.2 decode path — DQT/DHT/SOF0/DRI/SOS
  * segment parse, canonical Huffman tables (§C.2 / F.2.2.3 MINCODE/
  * MAXCODE/VALPTR), byte-unstuffed bit reading (§F.2.2.5, 0xFF00 →
  * 0xFF), DC prediction with restart-interval resets (§F.2.1.3.1),
  * run-length/EOB AC coefficient decode (§F.2.2.2), dequantization,
  * zigzag inverse (§A.3.6), and a separable double-precision 2-D IDCT
  * (§A.3.3) with level shift and clamping.
  *
  * Scope (r14): one general multi-component core ([[decodePlanes]])
  * covering grayscale AND 3-component YCbCr color scans with arbitrary
  * baseline sampling factors (4:4:4 / 4:2:2 / 4:2:0 — the §A.2.3
  * interleaved MCU layout with per-component H×V block sub-grids,
  * per-component quant/Huffman table selection, and per-component DC
  * predictors reset per restart interval, which counts MCUs). Two
  * facades: [[decode]] (grayscale, the r13 surface unchanged) and
  * [[decodeRgb]] (color: sample-replication chroma upsample per JFIF
  * §"subsampling", BT.601 full-range YCbCr→RGB as specified in JFIF
  * 1.02). Progressive/arithmetic/hierarchical frames reject loudly.
  *
  * Cost shape: decode is O(pixels) per payload with a ~1 KB table
  * state, run inside the same batched mapPartitions codec slot as the
  * PNG path — only per-image stats leave the task, never rasters.
  * Decoder output is NOT bit-pinned to ImageIO's (T.83 allows ±1 ULP
  * IDCT variation between compliant decoders, and chroma UPSAMPLE
  * filters are not standardized at all — libjpeg's "fancy" triangular
  * filter vs sample replication differ wherever chroma has gradients);
  * MultimodalSpec pins per-pixel agreement within the compliance band
  * on the luma path and a calibrated band on the color path, and the
  * registered rows hash tolerance-band BOOLEANS against the pre-encode
  * closed form, which is exactly as strong as a lossy codec permits.
  */
object JpegDecode {

  final case class Decoded(width: Int, height: Int, pixels: Array[Int])

  /** Color decode result: pixels packed 0xRRGGBB row-major. */
  final case class DecodedRgb(width: Int, height: Int, pixels: Array[Int])

  /** One frame component's decoded (padded) sample plane: `w`×`h` is
    * the MCU-padded block grid, `sw`×`sh` the component's true sample
    * dimensions (§A.1.1 ceil(width·Hᵢ/Hmax) × ceil(height·Vᵢ/Vmax)).
    */
  final case class Plane(w: Int, h: Int, sw: Int, sh: Int,
      hSamp: Int, vSamp: Int, samples: Array[Int])

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) · C(u)/2 — the separable 1-D IDCT kernel
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) math.sqrt(0.5) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Canonical Huffman table (T.81 §F.2.2.3 decode procedure). */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var l = 1
      var code = br.bit()
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      if (l > 16) throw new IllegalArgumentException("jpeg: bad Huffman code")
      symbols(valPtr(l) + code - minCode(l))
    }
  }

  /** Entropy-segment bit reader with §F.2.2.5 byte unstuffing. Stops
    * at any non-stuffed marker (RSTn consumed via [[restart]], EOI
    * left in place); reads past the segment pad with 1-bits, the
    * conventional fill.
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    private var atMarker = false

    def bit(): Int = {
      if (cnt == 0) {
        if (atMarker || pos >= bytes.length) return 1 // pad
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          val nxt = if (pos + 1 < bytes.length) bytes(pos + 1) & 0xff else 0xd9
          if (nxt == 0x00) { pos += 2; buf = 0xff; cnt = 8 }
          else { atMarker = true; return 1 } // marker: leave for caller
        } else { pos += 1; buf = b; cnt = 8 }
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Consume an RSTn marker between restart intervals. */
    def restart(): Unit = {
      cnt = 0
      atMarker = false
      if (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff) {
        val m = bytes(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) pos += 2
        else throw new IllegalArgumentException(
          f"jpeg: expected RSTn at byte $pos, got marker $m%02x")
      } else throw new IllegalArgumentException("jpeg: missing restart marker")
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Separable 2-D IDCT (§A.3.3) of one dequantized block into the
    * plane at (px0, py0), with level shift and clamp — shared by the
    * sequential per-block path and the progressive full-frame pass.
    */
  private def idctBlock(coef: Array[Double], tmp: Array[Double],
      plane: Plane, px0: Int, py0: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Cos(u * 8 + x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = acc
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Cos(u * 8 + yy) * tmp(u * 8 + x); u += 1 }
        val s = math.rint(acc + 128.0).toInt
        plane.samples((py0 + yy) * plane.w + (px0 + x)) =
          if (s < 0) 0 else if (s > 255) 255 else s
        yy += 1
      }
      x += 1
    }
  }

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** The general baseline decode: frame parse + interleaved-MCU
    * entropy decode of EVERY component into its own sample plane.
    * Returns (frame width, frame height, planes in frame order).
    */
  def decodePlanes(bytes: Array[Byte]): (Int, Int, Vector[Plane]) = {
    def u8(i: Int): Int = {
      if (i >= bytes.length)
        throw new IllegalArgumentException("jpeg: truncated stream")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    require(bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8,
      "jpeg: missing SOI marker")

    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var width = 0
    var height = 0
    var comps: Vector[Comp] = Vector.empty
    var restartInterval = 0
    var i = 2
    var scanStart = -1
    // per frame-component entropy table ids, filled by SOS
    var dcId: Array[Int] = null
    var acId: Array[Int] = null

    while (scanStart < 0) {
      if (u8(i) != 0xff)
        throw new IllegalArgumentException(s"jpeg: expected marker at byte $i")
      var j = i + 1
      while (u8(j) == 0xff) j += 1
      val m = u8(j)
      val seg = j + 1
      m match {
        case 0xd8 | 0x01 => i = seg
        case r if r >= 0xd0 && r <= 0xd7 => i = seg
        case 0xd9 => throw new IllegalArgumentException("jpeg: EOI before SOS")
        case 0xdb => // DQT: one or more tables
          val end = seg + u16(seg)
          var p = seg + 2
          while (p < end) {
            val pq = u8(p) >> 4
            val tq = u8(p) & 15
            val t = new Array[Int](64)
            var k = 0
            if (pq == 0) { while (k < 64) { t(k) = u8(p + 1 + k); k += 1 }; p += 65 }
            else { while (k < 64) { t(k) = u16(p + 1 + 2 * k); k += 1 }; p += 129 }
            quant(tq) = t
          }
          i = end
        case 0xc4 => // DHT: one or more tables
          val end = seg + u16(seg)
          var p = seg + 2
          while (p < end) {
            val tc = u8(p) >> 4
            val th = u8(p) & 15
            val counts = Array.tabulate(16)(l => u8(p + 1 + l))
            val n = counts.sum
            val symbols = Array.tabulate(n)(k => u8(p + 17 + k))
            val h = new Huff(counts, symbols)
            if (tc == 0) dcTables(th) = h else acTables(th) = h
            p += 17 + n
          }
          i = end
        case 0xdd => // DRI
          restartInterval = u16(seg + 2)
          i = seg + u16(seg)
        case 0xc0 | 0xc1 => // SOF0/1 — baseline(+extended) sequential
          height = u16(seg + 3)
          width = u16(seg + 5)
          val nf = u8(seg + 7)
          if (nf != 1 && nf != 3) throw new IllegalArgumentException(
            s"jpeg: 1 (gray) or 3 (YCbCr) components supported, got $nf")
          comps = Vector.tabulate(nf) { c =>
            val base = seg + 8 + c * 3
            val hv = u8(base + 1)
            Comp(u8(base), hv >> 4, hv & 15, u8(base + 2))
          }
          comps.foreach { c =>
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4)
              throw new IllegalArgumentException(
                s"jpeg: illegal sampling ${c.h}x${c.v} for component ${c.id}")
          }
          i = seg + u16(seg)
        case f if f >= 0xc2 && f <= 0xcf && f != 0xc4 && f != 0xc8 && f != 0xcc =>
          throw new IllegalArgumentException(
            f"jpeg: non-baseline frame (SOF${f - 0xc0}%d) unsupported")
        case 0xda => // SOS
          val ns = u8(seg + 2)
          if (comps.isEmpty) throw new IllegalArgumentException(
            "jpeg: SOS before SOF")
          if (ns != comps.length) throw new IllegalArgumentException(
            s"jpeg: expected one interleaved scan of ${comps.length} " +
              s"components, got $ns (progressive-style multi-scan unsupported)")
          dcId = new Array[Int](comps.length)
          acId = new Array[Int](comps.length)
          var c = 0
          while (c < ns) {
            val cs = u8(seg + 3 + 2 * c)
            val k = comps.indexWhere(_.id == cs)
            if (k < 0) throw new IllegalArgumentException(
              s"jpeg: scan component $cs not in frame")
            dcId(k) = u8(seg + 4 + 2 * c) >> 4
            acId(k) = u8(seg + 4 + 2 * c) & 15
            c += 1
          }
          scanStart = seg + u16(seg)
        case _ => i = seg + u16(seg)
      }
    }
    require(width > 0 && height > 0 && comps.nonEmpty, "jpeg: no frame header")
    comps.zipWithIndex.foreach { case (c, k) =>
      require(quant(c.tq) != null && dcTables(dcId(k)) != null &&
        acTables(acId(k)) != null, "jpeg: missing quant/Huffman table")
    }

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val planes = comps.map { c =>
      val pw = mcusX * c.h * 8
      val ph = mcusY * c.v * 8
      Plane(pw, ph,
        (width * c.h + hMax - 1) / hMax, (height * c.v + vMax - 1) / vMax,
        c.h, c.v, new Array[Int](pw * ph))
    }

    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    val pred = new Array[Int](comps.length)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var k = 0
      while (k < comps.length) {
        val c = comps(k)
        val qt = quant(c.tq)
        val plane = planes(k)
        var v = 0
        while (v < c.v) {
          var h = 0
          while (h < c.h) {
            java.util.Arrays.fill(coef, 0.0)
            // DC
            val t = dcTables(dcId(k)).decode(br)
            pred(k) += extend(br.receive(t), t)
            coef(0) = pred(k).toDouble * qt(0)
            // AC
            var z = 1
            var eob = false
            while (z < 64 && !eob) {
              val rs = acTables(acId(k)).decode(br)
              val r = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (r == 15) z += 16 else eob = true // ZRL / EOB
              } else {
                z += r
                if (z > 63)
                  throw new IllegalArgumentException("jpeg: AC index overflow")
                coef(Zigzag(z)) = extend(br.receive(s), s).toDouble * qt(z)
                z += 1
              }
            }
            idctBlock(coef, tmp, plane, (mx * c.h + h) * 8, (my * c.v + v) * 8)
            h += 1
          }
          v += 1
        }
        k += 1
      }
      mcu += 1
    }
    (width, height, planes)
  }

  /** First SOFn index of the stream (0 = baseline, 2 = progressive …)
    * via a §B.2.2 marker walk — the facade router. Throws on streams
    * with no frame header.
    */
  def sofType(bytes: Array[Byte]): Int = {
    def u8(i: Int): Int = {
      if (i >= bytes.length)
        throw new IllegalArgumentException("jpeg: truncated stream")
      bytes(i) & 0xff
    }
    require(bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8,
      "jpeg: missing SOI marker")
    var i = 2
    while (true) {
      if (u8(i) != 0xff)
        throw new IllegalArgumentException(s"jpeg: expected marker at byte $i")
      var j = i + 1
      while (u8(j) == 0xff) j += 1
      val m = u8(j)
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
        return m - 0xc0
      if (m == 0xd9 || m == 0xda)
        throw new IllegalArgumentException("jpeg: no frame header before scan/EOI")
      i = if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) j + 1
          else j + 1 + ((u8(j + 1) << 8) | u8(j + 2))
    }
    -1 // unreachable
  }

  /** PROGRESSIVE decode (T.81 §G — SOF2 spectral selection +
    * successive approximation): every scan deposits unquantized
    * coefficient bits into per-component block stores; dequantization
    * and the IDCT run ONCE over the accumulated coefficients at EOI.
    * Covers the full libjpeg scan-script feature set: interleaved and
    * non-interleaved first DC scans (diff<<Al), DC refinement bits,
    * AC first scans with EOB-run coding (§G.1.2.2), and the AC
    * refinement correction-bit procedure (§G.1.2.3 — zero-history
    * placements after r skips, append bits on nonzero-history
    * coefficients, EOB-run tail corrections). DHT/DQT redefinition
    * between scans honored; restart intervals reset DC predictors AND
    * the EOB run. Arithmetic/hierarchical still reject loudly.
    */
  def decodeProgressivePlanes(bytes: Array[Byte]): (Int, Int, Vector[Plane]) = {
    def u8(i: Int): Int = {
      if (i >= bytes.length)
        throw new IllegalArgumentException("jpeg: truncated stream")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    require(bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8,
      "jpeg: missing SOI marker")

    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var width = 0
    var height = 0
    var comps: Vector[Comp] = Vector.empty
    var restartInterval = 0
    var hMax = 0
    var vMax = 0
    var mcusX = 0
    var mcusY = 0
    // per component: MCU-padded block-grid dims + the coefficient store
    // (64 ints per block, NATURAL order — zigzag resolved at deposit)
    var blockW: Array[Int] = null
    var blockH: Array[Int] = null
    var store: Array[Array[Int]] = null

    def decodeScan(seg: Int): Int = {
      val ns = u8(seg + 2)
      require(comps.nonEmpty, "jpeg: SOS before SOF")
      val scanComp = new Array[Int](ns)
      val dcId = new Array[Int](ns)
      val acId = new Array[Int](ns)
      var c = 0
      while (c < ns) {
        val cs = u8(seg + 3 + 2 * c)
        val k = comps.indexWhere(_.id == cs)
        if (k < 0) throw new IllegalArgumentException(
          s"jpeg: scan component $cs not in frame")
        scanComp(c) = k
        dcId(c) = u8(seg + 4 + 2 * c) >> 4
        acId(c) = u8(seg + 4 + 2 * c) & 15
        c += 1
      }
      val pOff = seg + 3 + 2 * ns
      val ss = u8(pOff)
      val se = u8(pOff + 1)
      val ah = u8(pOff + 2) >> 4
      val al = u8(pOff + 2) & 15
      if (ss == 0) require(se == 0, "jpeg: DC scan must have Se=0")
      else require(ns == 1, "jpeg: AC scans are single-component (§G.1.1)")
      require(se <= 63 && ss <= se || (ss == 0 && se == 0),
        s"jpeg: bad spectral band $ss..$se")

      val br = new BitReader(bytes, seg + u16(seg))
      val pred = new Array[Int](ns)
      var eobrun = 0
      val p1 = 1 << al
      val m1 = -1 << al

      def dcFirst(k: Int, ci: Int, base: Int): Unit = {
        val t = dcTables(dcId(ci)).decode(br)
        pred(ci) += extend(br.receive(t), t)
        store(k)(base) = pred(ci) << al
      }
      def dcRefine(k: Int, base: Int): Unit =
        if (br.bit() == 1) store(k)(base) |= p1
      def acFirst(k: Int, ci: Int, base: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var z = ss
        var done = false
        while (z <= se && !done) {
          val rs = acTables(acId(ci)).decode(br)
          val r = rs >> 4
          val s = rs & 15
          if (s == 0) {
            if (r == 15) z += 16 // ZRL
            else {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.receive(r)
              done = true
            }
          } else {
            z += r
            if (z > se)
              throw new IllegalArgumentException("jpeg: AC index past band end")
            store(k)(base + Zigzag(z)) = extend(br.receive(s), s) << al
            z += 1
          }
        }
      }
      def acRefine(k: Int, ci: Int, base: Int): Unit = {
        var z = ss
        if (eobrun == 0) {
          var brk = false
          while (z <= se && !brk) {
            val rs = acTables(acId(ci)).decode(br)
            var r = rs >> 4
            val s = rs & 15
            var newval = 0
            if (s == 0) {
              if (r != 15) {
                eobrun = 1 << r
                if (r > 0) eobrun += br.receive(r)
                brk = true
              } // r==15: run of 16 zero-history coefficients
            } else {
              require(s == 1, "jpeg: AC refinement symbol size must be 1")
              newval = if (br.bit() == 1) p1 else m1
            }
            if (!brk) {
              var placed = false
              while (!placed && z <= se) {
                val idx = base + Zigzag(z)
                if (store(k)(idx) != 0) {
                  if (br.bit() == 1 && (store(k)(idx) & p1) == 0)
                    store(k)(idx) += (if (store(k)(idx) >= 0) p1 else m1)
                } else {
                  if (r == 0) {
                    if (newval != 0) store(k)(idx) = newval
                    placed = true
                  } else r -= 1
                }
                z += 1
              }
            }
          }
        }
        if (eobrun > 0) {
          // EOB run: correction bits for every remaining nonzero-history
          // coefficient in the band
          while (z <= se) {
            val idx = base + Zigzag(z)
            if (store(k)(idx) != 0) {
              if (br.bit() == 1 && (store(k)(idx) & p1) == 0)
                store(k)(idx) += (if (store(k)(idx) >= 0) p1 else m1)
            }
            z += 1
          }
          eobrun -= 1
        }
      }

      if (ss == 0 && ns > 1) {
        // interleaved DC scan: frame MCU traversal, h×v blocks per comp
        require(ns == comps.length,
          "jpeg: partial-subset interleaved scans unsupported")
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            br.restart(); java.util.Arrays.fill(pred, 0); eobrun = 0
          }
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var ci = 0
          while (ci < ns) {
            val k = scanComp(ci)
            val cc = comps(k)
            var v = 0
            while (v < cc.v) {
              var h = 0
              while (h < cc.h) {
                val bx = mx * cc.h + h
                val by = my * cc.v + v
                val base = (by * blockW(k) + bx) * 64
                if (ah == 0) dcFirst(k, ci, base) else dcRefine(k, base)
                h += 1
              }
              v += 1
            }
            ci += 1
          }
          mcu += 1
        }
      } else {
        // non-interleaved: one block per MCU over the component's own
        // (unpadded) block grid §A.2.2
        val k = scanComp(0)
        val cc = comps(k)
        val cw = ((width * cc.h + hMax - 1) / hMax + 7) / 8
        val ch = ((height * cc.v + vMax - 1) / vMax + 7) / 8
        var b = 0
        val nB = cw * ch
        while (b < nB) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            br.restart(); java.util.Arrays.fill(pred, 0); eobrun = 0
          }
          val base = ((b / cw) * blockW(k) + (b % cw)) * 64
          if (ss == 0) { if (ah == 0) dcFirst(k, 0, base) else dcRefine(k, base) }
          else { if (ah == 0) acFirst(k, 0, base) else acRefine(k, 0, base) }
          b += 1
        }
      }
      br.pos
    }

    // find the next real marker (skips stuffed 0x00, RSTn, fill 0xFF)
    def nextMarker(from: Int): Int = {
      var p = from
      while (p + 1 < bytes.length) {
        val m = bytes(p + 1) & 0xff
        if ((bytes(p) & 0xff) == 0xff && m != 0x00 && m != 0xff &&
          !(m >= 0xd0 && m <= 0xd7)) return p
        p += 1
      }
      throw new IllegalArgumentException("jpeg: missing EOI")
    }

    var i = 2
    var done = false
    while (!done) {
      if (u8(i) != 0xff)
        throw new IllegalArgumentException(s"jpeg: expected marker at byte $i")
      var j = i + 1
      while (u8(j) == 0xff) j += 1
      val m = u8(j)
      val seg = j + 1
      m match {
        case 0xd8 | 0x01 => i = seg
        case r if r >= 0xd0 && r <= 0xd7 => i = seg
        case 0xd9 => done = true
        case 0xdb =>
          val end = seg + u16(seg)
          var p = seg + 2
          while (p < end) {
            val pq = u8(p) >> 4
            val tq = u8(p) & 15
            val t = new Array[Int](64)
            var k = 0
            if (pq == 0) { while (k < 64) { t(k) = u8(p + 1 + k); k += 1 }; p += 65 }
            else { while (k < 64) { t(k) = u16(p + 1 + 2 * k); k += 1 }; p += 129 }
            quant(tq) = t
          }
          i = end
        case 0xc4 =>
          val end = seg + u16(seg)
          var p = seg + 2
          while (p < end) {
            val tc = u8(p) >> 4
            val th = u8(p) & 15
            val counts = Array.tabulate(16)(l => u8(p + 1 + l))
            val n = counts.sum
            val symbols = Array.tabulate(n)(k => u8(p + 17 + k))
            val h = new Huff(counts, symbols)
            if (tc == 0) dcTables(th) = h else acTables(th) = h
            p += 17 + n
          }
          i = end
        case 0xdd =>
          restartInterval = u16(seg + 2)
          i = seg + u16(seg)
        case 0xc2 =>
          height = u16(seg + 3)
          width = u16(seg + 5)
          val nf = u8(seg + 7)
          if (nf != 1 && nf != 3) throw new IllegalArgumentException(
            s"jpeg: 1 (gray) or 3 (YCbCr) components supported, got $nf")
          comps = Vector.tabulate(nf) { c =>
            val base = seg + 8 + c * 3
            val hv = u8(base + 1)
            Comp(u8(base), hv >> 4, hv & 15, u8(base + 2))
          }
          comps.foreach { c =>
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4)
              throw new IllegalArgumentException(
                s"jpeg: illegal sampling ${c.h}x${c.v} for component ${c.id}")
          }
          hMax = comps.map(_.h).max
          vMax = comps.map(_.v).max
          mcusX = (width + 8 * hMax - 1) / (8 * hMax)
          mcusY = (height + 8 * vMax - 1) / (8 * vMax)
          blockW = comps.map(c => mcusX * c.h).toArray
          blockH = comps.map(c => mcusY * c.v).toArray
          store = comps.indices.map(k =>
            new Array[Int](blockW(k) * blockH(k) * 64)).toArray
          i = seg + u16(seg)
        case f if f >= 0xc0 && f <= 0xcf && f != 0xc4 && f != 0xc8 && f != 0xcc =>
          throw new IllegalArgumentException(
            f"jpeg: expected SOF2 progressive frame, got SOF${f - 0xc0}%d")
        case 0xda =>
          require(store != null, "jpeg: SOS before SOF")
          i = nextMarker(decodeScan(seg))
        case _ => i = seg + u16(seg)
      }
    }
    require(width > 0 && height > 0 && comps.nonEmpty, "jpeg: no frame header")

    // all scans absorbed: dequantize + IDCT the accumulated coefficients
    val planes = comps.zipWithIndex.map { case (c, k) =>
      require(quant(c.tq) != null, "jpeg: missing quant table")
      val pw = blockW(k) * 8
      val ph = blockH(k) * 8
      val plane = Plane(pw, ph,
        (width * c.h + hMax - 1) / hMax, (height * c.v + vMax - 1) / vMax,
        c.h, c.v, new Array[Int](pw * ph))
      val qt = quant(c.tq)
      val coef = new Array[Double](64)
      val tmp = new Array[Double](64)
      var by = 0
      while (by < blockH(k)) {
        var bx = 0
        while (bx < blockW(k)) {
          val base = (by * blockW(k) + bx) * 64
          var z = 0
          while (z < 64) {
            val nat = Zigzag(z)
            coef(nat) = store(k)(base + nat).toDouble * qt(z)
            z += 1
          }
          idctBlock(coef, tmp, plane, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      plane
    }
    (width, height, planes)
  }

  /** Grayscale facade — the r13 API surface, unchanged semantics;
    * routes SOF0/1 to the sequential path and SOF2 to the progressive
    * accumulator (r15).
    */
  def decode(bytes: Array[Byte]): Decoded = {
    val (w, h, planes) =
      if (sofType(bytes) == 2) decodeProgressivePlanes(bytes)
      else decodePlanes(bytes)
    if (planes.length != 1) throw new IllegalArgumentException(
      s"jpeg: grayscale decode on a ${planes.length}-component frame " +
        "— use decodeRgb")
    val p = planes.head
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      // gray frames have h=v=1 so the plane is full-resolution; crop pad
      System.arraycopy(p.samples, y * p.w, px, y * w, w)
      y += 1
    }
    Decoded(w, h, px)
  }

  /** Color facade: 3-component YCbCr → packed 0xRRGGBB. Chroma planes
    * upsample by sample replication (nearest; JFIF leaves the filter
    * to the decoder) and convert via JFIF 1.02's full-range BT.601:
    * R = Y + 1.402·(Cr−128), G = Y − 0.344136·(Cb−128) − 0.714136·(Cr−128),
    * B = Y + 1.772·(Cb−128).
    */
  def decodeRgb(bytes: Array[Byte]): DecodedRgb = {
    val (w, h, planes) =
      if (sofType(bytes) == 2) decodeProgressivePlanes(bytes)
      else decodePlanes(bytes)
    if (planes.length != 3) throw new IllegalArgumentException(
      s"jpeg: color decode on a ${planes.length}-component frame — use decode")
    val Vector(py, pcb, pcr) = planes
    val hMax = planes.map(_.hSamp).max
    val vMax = planes.map(_.vSamp).max
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def samp(p: Plane): Int = {
          val sx0 = x * p.hSamp / hMax
          val sy0 = y * p.vSamp / vMax
          // clamp into the true sample area (pad blocks carry garbage)
          val sx = if (sx0 >= p.sw) p.sw - 1 else sx0
          val sy = if (sy0 >= p.sh) p.sh - 1 else sy0
          p.samples(sy * p.w + sx)
        }
        val yy = samp(py).toDouble
        val cb = samp(pcb) - 128.0
        val cr = samp(pcr) - 128.0
        def clamp(d: Double): Int = {
          val v = math.rint(d).toInt
          if (v < 0) 0 else if (v > 255) 255 else v
        }
        val r = clamp(yy + 1.402 * cr)
        val g = clamp(yy - 0.344136 * cb - 0.714136 * cr)
        val b = clamp(yy + 1.772 * cb)
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    DecodedRgb(w, h, out)
  }

  def meanPixel(d: Decoded): Double = {
    var sum = 0L
    var i = 0
    while (i < d.pixels.length) { sum += d.pixels(i); i += 1 }
    sum.toDouble / d.pixels.length
  }
}
