package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing + REAL image codec: PNG round trip through
  * javax.imageio, pixel-exact area resample, schema/batch shape of the
  * mapPartitions extract, and frame-sample counts.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.build("local[4]", "4")

  private val dir = "/root/testdata/sf0.001"

  test("media table carries binary payload + typed metadata struct") {
    val m = MultimodalOps.mediaTable(spark, dir)
    val f = m.schema("payload").dataType.typeName
    assert(f == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    assert(m.filter(col("meta.width") <= 0 || col("meta.n_frames") <= 0).count() == 0)
  }

  test("PNG payloads are real: ImageIO round-trips every pixel") {
    import MultimodalOps.MediaCodec
    val bytes = MediaCodec.encodePng(docId = 42L, w = 32, h = 16)
    // PNG magic — the payload is an actual file another tool could open
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val img = MediaCodec.decodePng(bytes)
    assert(img.getWidth == 32 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 32)
      assert(img.getRaster.getSample(x, y, 0) == MediaCodec.pixel(42L, x, y))
  }

  test("halve() is the exact 2x2 floor area average") {
    import MultimodalOps.MediaCodec
    val img = MediaCodec.decodePng(MediaCodec.encodePng(7L, 8, 4))
    val half = MediaCodec.halve(img)
    assert(half.getWidth == 4 && half.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 4) {
      val exp = (MediaCodec.pixel(7L, 2 * x, 2 * y) + MediaCodec.pixel(7L, 2 * x + 1, 2 * y) +
        MediaCodec.pixel(7L, 2 * x, 2 * y + 1) + MediaCodec.pixel(7L, 2 * x + 1, 2 * y + 1)) / 4
      assert(half.getRaster.getSample(x, y, 0) == exp)
    }
  }

  test("feature extraction: fixed dim, partition-preserving, deterministic") {
    val m = MultimodalOps.mediaTable(spark, dir)
      .filter(col("meta.kind") === "image").repartition(3)
    val feats = MultimodalOps.extractFeatures(m, dim = 16, batchSize = 8)
    assert(feats.rdd.getNumPartitions == 3) // no shuffle introduced
    assert(feats.filter(size(col("features")) =!= 16).count() == 0)
    val a = feats.orderBy("doc_id").collect().map(_.getSeq[Float](1))
    val b = MultimodalOps.extractFeatures(m, dim = 16, batchSize = 3)
      .orderBy("doc_id").collect().map(_.getSeq[Float](1))
    // batch size must not change results — pure per-row function
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("WAV payloads are real RIFF files: header fields and samples round-trip") {
    import MultimodalOps.MediaCodec
    val wav = MediaCodec.decodeWav(MediaCodec.encodeWav(7L))
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bits == 16)
    assert(wav.samples.length == MediaCodec.audioSampleCount(7L))
    assert(wav.samples.zipWithIndex.forall { case (s, i) =>
      s + 32768 == MediaCodec.sampleU16(7L, i)
    })
    // chunk walker handles unknown chunks + RIFF odd-size padding: splice
    // a 3-byte LIST chunk (padded to 4) between fmt and data
    val bytes = MediaCodec.encodeWav(7L)
    val (head, tail) = bytes.splitAt(36) // end of fmt chunk
    val junk = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0)).array()
    val spliced = head ++ junk ++ tail
    val wav2 = MediaCodec.decodeWav(spliced)
    assert(wav2.samples.toSeq == wav.samples.toSeq,
      "decoder must skip unknown padded chunks")
  }

  test("Y4M payloads are real YUV4MPEG2 streams: demux agrees with the closed form") {
    import MultimodalOps.MediaCodec
    val id = 8L // doc_id % 3 == 2 → video
    val nf = (id % 30 + 1).toInt
    val v = MediaCodec.decodeY4m(MediaCodec.encodeY4m(id, nf))
    val (w, h) = MediaCodec.videoDims(id)
    assert(v.width == w && v.height == h)
    assert(v.frameMeanLuma.length == nf, "frame count comes from the FRAME walk")
    v.frameMeanLuma.zipWithIndex.foreach { case (m, f) =>
      val expected = ((37L * id + 11L * f * f) % 192L).toDouble + 3.0
      assert(m == expected, s"frame $f mean $m != $expected")
    }
  }

  test("frame sampling emits ceil(n_frames/5) frames per video") {
    val m = MultimodalOps.mediaTable(spark, dir).filter(col("meta.kind") === "video")
    val sampled = SparkEntryAccess.query("mm_frame_sample")(spark, dir)
    val perDoc = sampled.groupBy("doc_id").count()
    val expected = m.select(col("doc_id"),
      ceil(col("meta.n_frames").cast("double") / 5).cast("long").as("exp"))
    assert(perDoc.join(expected, "doc_id")
      .filter(col("count") =!= col("exp")).count() == 0)
  }

  test("JPEG transcode is real lossy compression; marker walk agrees with ImageIO") {
    import MultimodalOps.MediaCodec
    for (docId <- Seq(0L, 3L, 9L, 21L)) {
      val w = (16 * (docId % 4 + 1)).toInt
      val h = (16 * (docId % 5 + 1)).toInt
      val png = MediaCodec.encodePng(docId, w, h)
      val jpeg = MediaCodec.encodeJpeg(MediaCodec.decodePng(png))
      // header walk without entropy decode matches the full decoder
      val (pw, ph, comps) = MediaCodec.jpegDims(jpeg)
      val full = MediaCodec.decodePng(jpeg) // ImageIO dispatches on content
      assert((pw, ph) == (full.getWidth, full.getHeight) && (pw, ph) == (w, h))
      assert(comps == 1) // gray raster -> single-component JPEG
      // genuinely lossy DCT path, not a PNG rename: bytes differ and the
      // decoded mean only APPROXIMATES the closed form (exact for PNG)
      assert(!jpeg.sameElements(png))
      val exactMean = MediaCodec.meanPixel(MediaCodec.decodePng(png))
      val jpegMean = MediaCodec.meanPixel(full)
      assert(math.abs(jpegMean - exactMean) < 16.0,
        s"doc $docId: jpeg mean $jpegMean too far from $exactMean")
    }
  }

  test("JPEG marker walk rejects corrupt streams instead of misreading them") {
    import MultimodalOps.MediaCodec
    val jpeg = MediaCodec.encodeJpeg(
      MediaCodec.decodePng(MediaCodec.encodePng(5L, 32, 16)))
    intercept[IllegalArgumentException] {
      MediaCodec.jpegDims("not a jpeg at all".getBytes("US-ASCII"))
    }
    // truncations anywhere — inside a fill run, mid-segment, before
    // any SOF — must reject with the documented exception type, never
    // an index error
    for (n <- Seq(3, 4, 5, 8, 12)) {
      intercept[IllegalArgumentException] { MediaCodec.jpegDims(jpeg.take(n)) }
    }
    intercept[IllegalArgumentException] {
      MediaCodec.jpegDims(Array(0xff, 0xd8, 0xff, 0xff).map(_.toByte))
    }
    // SOI immediately followed by EOI: legal markers, no frame header
    intercept[IllegalArgumentException] {
      MediaCodec.jpegDims(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
    }
  }

  test("luma histogram: bins total w*h and match the closed-form pixel counts") {
    import MultimodalOps.MediaCodec
    val rows = SparkEntryAccess.query("mm_luma_histogram")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (id, bs) =>
      val (w, h) = (16 * (id % 4 + 1), 16 * (id % 5 + 1))
      assert(bs.map(_._3).sum == w * h, s"doc $id histogram mass")
      val expected: Map[Int, Long] = (0L until w * h)
        .map(i => MediaCodec.pixel(id, (i % w).toInt, (i / w).toInt) / 32)
        .groupBy(b => b).map { case (b, xs) => b -> xs.size.toLong }
      assert(bs.map(b => b._2 -> b._3).toMap == expected, s"doc $id bin counts")
    }
  }

  test("edge density: generic gradient loop equals the wrap-position closed form") {
    import MultimodalOps.MediaCodec
    val rows = SparkEntryAccess.query("mm_edge_density")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nh, nv, density) =>
      val (w, h) = ((16 * (id % 4 + 1)).toInt, (16 * (id % 5 + 1)).toInt)
      var (eh, ev) = (0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val v = MediaCodec.pixel(id, x, y)
        if (x < w - 1 && math.abs(MediaCodec.pixel(id, x + 1, y) - v) > 100) eh += 1
        if (y < h - 1 && math.abs(MediaCodec.pixel(id, x, y + 1) - v) > 100) ev += 1
      }
      assert(nh == eh && nv == ev, s"doc $id edge counts ($nh,$nv) vs ($eh,$ev)")
      val exp = math.floor((eh + ev).toDouble /
        ((w - 1) * h + w * (h - 1)) * 1e6 + 0.5) / 1e6
      assert(math.abs(density - exp) < 1e-9, s"doc $id density")
    }
    assert(rows.exists(_._2 > 0), "the mod-256 ramp must wrap somewhere")
  }

  test("mm_jpeg_meta reports header dims for every image doc") {
    val out = SparkEntryAccess.query("mm_jpeg_meta")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (16 * (id % 4 + 1)).toInt)
      assert(r.getInt(2) == (16 * (id % 5 + 1)).toInt)
      assert(r.getInt(3) == 1)
    }
  }

  test("JPEG entropy decode agrees with ImageIO within the T.83 band (±1/pixel)") {
    import MultimodalOps.MediaCodec
    for (docId <- Seq(0L, 3L, 9L, 21L, 33L); q <- Seq(0.75f, 0.95f, 1.0f)) {
      val w = (16 * (docId % 4 + 1)).toInt
      val h = (16 * (docId % 5 + 1)).toInt
      val jpeg = MediaCodec.encodeJpeg(
        MediaCodec.decodePng(MediaCodec.encodePng(docId, w, h)), q)
      val dec = JpegDecode.decode(jpeg)
      assert((dec.width, dec.height) == (w, h))
      val ref = MediaCodec.decodePng(jpeg) // ImageIO's own jpeg decode
      var maxD = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(dec.pixels(y * w + x) - ref.getRaster.getSample(x, y, 0))
        if (d > maxD) maxD = d
      }
      assert(maxD <= 1,
        s"doc $docId q=$q: decoder diverges from ImageIO by $maxD")
    }
  }

  test("JPEG decode tolerance bands: q=1.0 near-lossless, q=0.95 inside the row's bands") {
    import MultimodalOps.MediaCodec
    for (docId <- Seq(0L, 6L, 12L, 27L)) {
      val w = (16 * (docId % 4 + 1)).toInt
      val h = (16 * (docId % 5 + 1)).toInt
      val img = MediaCodec.decodePng(MediaCodec.encodePng(docId, w, h))
      def maxErr(q: Float): Int = {
        val dec = JpegDecode.decode(MediaCodec.encodeJpeg(img, q))
        (for (y <- 0 until h; x <- 0 until w)
          yield math.abs(dec.pixels(y * w + x) - MediaCodec.pixel(docId, x, y))).max
      }
      assert(maxErr(1.0f) <= 2, s"doc $docId: q=1.0 not near-lossless")
      // the registered row's band, with the measured worst case 7
      assert(maxErr(0.95f) <= 16, s"doc $docId: q=0.95 outside the row band")
    }
  }

  test("JPEG entropy decode rejects corrupt/unsupported streams loudly") {
    import MultimodalOps.MediaCodec
    val jpeg = MediaCodec.encodeJpeg(
      MediaCodec.decodePng(MediaCodec.encodePng(5L, 32, 16)), 0.95f)
    intercept[IllegalArgumentException] {
      JpegDecode.decode("nope".getBytes("US-ASCII"))
    }
    // truncation before the scan: segment parse must reject
    intercept[IllegalArgumentException] { JpegDecode.decode(jpeg.take(20)) }
    // facade mismatch rejects loudly in BOTH directions (r14: color is
    // supported — through decodeRgb, never silently through decode)
    val rgb = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) rgb.setRGB(x, y, (x * 16 + y) << 8)
    val colorJpeg = MediaCodec.encodeJpeg(rgb, 0.9f)
    val e = intercept[IllegalArgumentException] { JpegDecode.decode(colorJpeg) }
    assert(e.getMessage.contains("3-component"))
    val e2 = intercept[IllegalArgumentException] { JpegDecode.decodeRgb(jpeg) }
    assert(e2.getMessage.contains("1-component"))
  }

  test("JDK color JPEG is 4:2:0 on every fixture size (the interleave is exercised)") {
    import MultimodalOps.MediaCodec
    // read the SOF component specs straight off the bytes
    def sofHV(b: Array[Byte]): Seq[Int] = {
      var i = 2
      while (true) {
        val m = b(i + 1) & 0xff
        if (m == 0xc0) {
          val seg = i + 2
          val nf = b(seg + 7) & 0xff
          return (0 until nf).map(c => b(seg + 8 + c * 3 + 1) & 0xff)
        }
        i += 2 + (((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff))
      }
      Nil
    }
    for (w <- Seq(16, 32, 48, 64); h <- Seq(16, 32, 48)) {
      val jpeg = MediaCodec.encodeJpeg(MediaCodec.colorImage(7L, w, h), 0.95f)
      assert(sofHV(jpeg) == Seq(0x22, 0x11, 0x11),
        s"${w}x$h: expected YCbCr 4:2:0")
    }
  }

  test("PROGRESSIVE gray JPEG decode agrees with ImageIO within the T.83 band (±1/pixel)") {
    import MultimodalOps.MediaCodec
    for (docId <- Seq(0L, 3L, 9L, 21L, 33L); q <- Seq(0.75f, 0.95f)) {
      val w = (16 * (docId % 4 + 1)).toInt
      val h = (16 * (docId % 5 + 1)).toInt
      val jpeg = MediaCodec.encodeJpegProgressive(
        MediaCodec.decodePng(MediaCodec.encodePng(docId, w, h)), q)
      assert(JpegDecode.sofType(jpeg) == 2, "fixture must actually be SOF2")
      val dec = JpegDecode.decode(jpeg)
      assert((dec.width, dec.height) == (w, h))
      val ref = MediaCodec.decodePng(jpeg) // ImageIO's own progressive decode
      var maxD = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(dec.pixels(y * w + x) - ref.getRaster.getSample(x, y, 0))
        if (d > maxD) maxD = d
      }
      assert(maxD <= 1,
        s"doc $docId q=$q: progressive decoder diverges from ImageIO by $maxD")
    }
  }

  test("PROGRESSIVE color JPEG decode: bands vs closed form and vs ImageIO") {
    import MultimodalOps.MediaCodec
    for (docId <- Seq(0L, 3L, 9L, 21L, 33L)) {
      val w = (16 * (docId % 4 + 1)).toInt
      val h = (16 * (docId % 5 + 1)).toInt
      val jpeg = MediaCodec.encodeJpegProgressive(
        MediaCodec.colorImage(docId, w, h), 0.95f)
      assert(JpegDecode.sofType(jpeg) == 2)
      val dec = JpegDecode.decodeRgb(jpeg)
      assert((dec.width, dec.height) == (w, h))
      val ref = MediaCodec.decodePng(jpeg)
      var errSum = 0L
      var maxErr = 0
      var refSum = 0L
      var refMax = 0
      for (y <- 0 until h; x <- 0 until w) {
        val p = dec.pixels(y * w + x)
        val (wr, wg, wb) = MediaCodec.pixelRgb(docId, x, y)
        val chans = Seq(((p >> 16) & 0xff) - wr, ((p >> 8) & 0xff) - wg,
          (p & 0xff) - wb).map(math.abs)
        errSum += chans.sum
        maxErr = math.max(maxErr, chans.max)
        val r = ref.getRGB(x, y)
        val rchans = Seq(((p >> 16) & 0xff) - ((r >> 16) & 0xff),
          ((p >> 8) & 0xff) - ((r >> 8) & 0xff),
          (p & 0xff) - (r & 0xff)).map(math.abs)
        refSum += rchans.sum
        refMax = math.max(refMax, rchans.max)
      }
      val n = 3.0 * w * h
      assert(errSum / n <= 2.0 && maxErr <= 48,
        s"doc $docId: closed-form band blown (mean=${errSum / n} max=$maxErr)")
      assert(refSum / n <= 2.0 && refMax <= 48,
        s"doc $docId: ImageIO band blown (mean=${refSum / n} max=$refMax)")
    }
  }

  test("progressive JPEG rejection: truncated scans and wrong-frame routing fail loudly") {
    import MultimodalOps.MediaCodec
    val img = MediaCodec.decodePng(MediaCodec.encodePng(3L, 32, 64))
    val prog = MediaCodec.encodeJpegProgressive(img, 0.95f)
    // the progressive path must refuse a baseline frame and vice versa
    val base = MediaCodec.encodeJpeg(img, 0.95f)
    intercept[IllegalArgumentException](JpegDecode.decodeProgressivePlanes(base))
    intercept[IllegalArgumentException](JpegDecode.decodePlanes(prog))
    // truncation inside the multi-scan body: EOI never arrives
    intercept[IllegalArgumentException](
      JpegDecode.decodeProgressivePlanes(prog.take(prog.length / 2)))
  }

  test("color JPEG decode: bands vs closed form and vs ImageIO on all fixture sizes") {
    import MultimodalOps.MediaCodec
    for (docId <- Seq(0L, 3L, 9L, 21L, 33L)) {
      val w = (16 * (docId % 4 + 1)).toInt
      val h = (16 * (docId % 5 + 1)).toInt
      val jpeg = MediaCodec.encodeJpeg(MediaCodec.colorImage(docId, w, h), 0.95f)
      val dec = JpegDecode.decodeRgb(jpeg)
      assert((dec.width, dec.height) == (w, h))
      // vs the pre-encode closed form: quantization + 4:2:0 loss only
      var errSum = 0L
      var maxErr = 0
      // vs ImageIO's decode of the SAME bytes: IDCT is T.83-banded but
      // chroma upsample differs (fancy vs replication) — calibrated band
      val ref = MediaCodec.decodePng(jpeg)
      var refMax = 0
      var refSum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = dec.pixels(y * w + x)
        val (wr, wg, wb) = MediaCodec.pixelRgb(docId, x, y)
        val chans = Seq(((p >> 16) & 0xff) - wr, ((p >> 8) & 0xff) - wg,
          (p & 0xff) - wb).map(math.abs)
        errSum += chans.sum
        maxErr = math.max(maxErr, chans.max)
        val q = ref.getRGB(x, y)
        val rchans = Seq(((p >> 16) & 0xff) - ((q >> 16) & 0xff),
          ((p >> 8) & 0xff) - ((q >> 8) & 0xff),
          (p & 0xff) - (q & 0xff)).map(math.abs)
        refSum += rchans.sum
        refMax = math.max(refMax, rchans.max)
      }
      val n = 3.0 * w * h
      assert(errSum / n <= 2.0 && maxErr <= 48,
        s"doc $docId: closed-form band blown (mean=${errSum / n} max=$maxErr)")
      assert(refSum / n <= 2.0 && refMax <= 48,
        s"doc $docId: ImageIO band blown (mean=${refSum / n} max=$refMax)")
    }
  }

  test("hand-assembled 4:4:4 JPEG: MCU walk, per-component DC prediction, exact DC decode") {
    // minimal from-scratch encoder: solid 8x8 blocks, DC-only (all-8
    // quant, single-EOB AC table), 3 components all 1x1 — pins the
    // non-subsampled interleave and per-component predictors exactly
    def makeJpeg444(blocks: Seq[(Int, Int, Int)], mcusX: Int, mcusY: Int): Array[Byte] = {
      require(blocks.length == mcusX * mcusY)
      val out = new java.io.ByteArrayOutputStream()
      def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
      def seg(marker: Int, payload: Seq[Int]): Unit = {
        b(0xff, marker); b((payload.length + 2) >> 8, (payload.length + 2) & 0xff)
        payload.foreach(v => out.write(v & 0xff))
      }
      b(0xff, 0xd8) // SOI
      seg(0xdb, 0x00 +: Seq.fill(64)(8)) // DQT id0, all 8s
      val (w, h) = (8 * mcusX, 8 * mcusY)
      seg(0xc0, Seq(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
        1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)) // SOF0: 3 comps, all 1x1, q0
      // DHT DC id0: 12 symbols (categories 0..11) all at code length 4
      seg(0xc4, Seq(0x00) ++ Seq(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
        ++ (0 to 11))
      // DHT AC id0: single EOB symbol at code length 1
      seg(0xc4, Seq(0x10) ++ Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
        ++ Seq(0x00))
      seg(0xda, Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)) // SOS
      // entropy: per MCU, per comp: DC category (4 bits) + amplitude + EOB '0'
      var acc = 0
      var nbits = 0
      val body = new java.io.ByteArrayOutputStream()
      def putBits(v: Int, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          acc = (acc << 1) | ((v >> i) & 1)
          nbits += 1
          if (nbits == 8) {
            body.write(acc)
            if (acc == 0xff) body.write(0x00) // byte stuffing
            acc = 0; nbits = 0
          }
          i -= 1
        }
      }
      val pred = Array(0, 0, 0)
      blocks.foreach { case (yv, cbv, crv) =>
        Seq(yv, cbv, crv).zipWithIndex.foreach { case (v, c) =>
          val level = v - 128 // DC quant 8 over (v-128)*8
          val diff = level - pred(c)
          pred(c) = level
          val s = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
          putBits(s, 4)
          if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
          putBits(0, 1) // EOB
        }
      }
      if (nbits > 0) { putBits((1 << (8 - nbits)) - 1, 8 - nbits) } // pad 1s
      body.toByteArray.foreach(out.write(_))
      b(0xff, 0xd9) // EOI
      out.toByteArray
    }
    // 2x2 MCUs, distinct solid YCbCr per block incl. negative diffs
    val blocks = Seq((200, 128, 128), (40, 100, 180), (128, 200, 60), (255, 0, 255))
    val jpeg = makeJpeg444(blocks, 2, 2)
    val (w0, h0, comps) = MultimodalOps.MediaCodec.jpegDims(jpeg)
    assert((w0, h0, comps) == (16, 16, 3))
    val dec = JpegDecode.decodeRgb(jpeg)
    def expectRgb(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def cl(d: Double) = math.max(0, math.min(255, math.rint(d).toInt))
      (cl(yv + 1.402 * (cr - 128)),
        cl(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        cl(yv + 1.772 * (cb - 128)))
    }
    for (by <- 0 until 2; bx <- 0 until 2; y <- 0 until 8; x <- 0 until 8) {
      val (yv, cb, cr) = blocks(by * 2 + bx)
      val (er, eg, eb) = expectRgb(yv, cb, cr)
      val p = dec.pixels((by * 8 + y) * 16 + (bx * 8 + x))
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == ((er, eg, eb)),
        s"block ($bx,$by) pixel ($x,$y)")
    }
    // independent cross-check: ImageIO decodes the same hand-made bytes
    val ref = MultimodalOps.MediaCodec.decodePng(jpeg)
    assert((ref.getWidth, ref.getHeight) == (16, 16))
    for (y <- 0 until 16; x <- 0 until 16) {
      val p = dec.pixels(y * 16 + x)
      val q = ref.getRGB(x, y)
      val d = Seq(((p >> 16) & 0xff) - ((q >> 16) & 0xff),
        ((p >> 8) & 0xff) - ((q >> 8) & 0xff), (p & 0xff) - (q & 0xff))
        .map(math.abs).max
      assert(d <= 2, s"ImageIO disagrees by $d at ($x,$y)")
    }
  }

  test("mm_jpeg_color_decode row: bands hold on every image doc") {
    val out = SparkEntryAccess.query("mm_jpeg_color_decode")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (16 * (id % 4 + 1)).toInt)
      assert(r.getInt(2) == (16 * (id % 5 + 1)).toInt)
      assert(r.getInt(3) == 3)
      assert(r.getBoolean(4) && r.getBoolean(5), s"band blown on doc $id")
    }
  }

  test("GIF LZW decode is pixel-exact: agrees with ImageIO and the closed form") {
    import MultimodalOps.MediaCodec
    for (docId <- Seq(0L, 3L, 9L, 21L, 33L)) {
      val w = (16 * (docId % 4 + 1)).toInt
      val h = (16 * (docId % 5 + 1)).toInt
      val gif = MediaCodec.encodeGif(
        MediaCodec.decodePng(MediaCodec.encodePng(docId, w, h)))
      val dec = GifDecode.decode(gif)
      assert((dec.width, dec.height) == (w, h))
      // lossless: every pixel equals the closed form exactly
      for (y <- 0 until h; x <- 0 until w)
        assert(dec.pixels(y * w + x) == MediaCodec.pixel(docId, x, y),
          s"doc $docId pixel ($x,$y)")
      // and equals ImageIO's own decode of the same bytes bit-for-bit
      val ref = MediaCodec.decodePng(gif)
      for (y <- 0 until h; x <- 0 until w)
        assert(dec.pixels(y * w + x) == ref.getRaster.getSample(x, y, 0))
    }
  }

  test("animated GIF: JDK-writer sequence decodes per-frame exact") {
    import MultimodalOps.MediaCodec
    val (docId, w, h, nf) = (7L, 32, 16, 4)
    val anim = GifDecode.decodeFrames(MediaCodec.encodeGifAnim(docId, w, h, nf))
    assert((anim.width, anim.height, anim.frames.length) == (w, h, nf))
    for (f <- 0 until nf) {
      val cv = anim.canvases(f)
      for (y <- 0 until h; x <- 0 until w)
        assert(cv(y * w + x) == MediaCodec.pixel(docId + f, x, y),
          s"frame $f ($x,$y)")
    }
    // single-image facade still reads frame 0 of the same stream
    val first = GifDecode.decode(MediaCodec.encodeGifAnim(docId, w, h, nf))
    assert(first.pixels.sameElements(anim.frames.head.pixels))
  }

  test("animated GIF: hand-assembled offsets, transparency hole, restore-bg disposal") {
    // an 8×8 89a stream the JDK writer never emits: frame 1 full-canvas
    // solid, disposal=2 (restore background); frame 2 a 4×4 rect at
    // (2,2) with a checkerboard of color 2 and TRANSPARENT index 3
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def b(v: Int): Unit = buf += v.toByte
    def u16(v: Int): Unit = { b(v & 0xff); b(v >> 8) }
    "GIF89a".foreach(c => b(c.toInt))
    u16(8); u16(8)     // logical screen 8×8
    b(0x81)            // GCT present, 4 entries (2 << 1)
    b(0)               // background index 0
    b(0)               // aspect
    // palette red channels: 10, 100, 200, 250 (g=b=r for gray reading)
    Seq(10, 100, 200, 250).foreach(v => { b(v); b(v); b(v) })
    // LZW payload: [clear, root, clear, root, …, eoi] at fixed 3-bit
    // width (every clear resets the table before it can grow)
    def lzwBlock(pixels: Seq[Int]): Unit = {
      b(2) // min code size (4-color palette)
      val codes = pixels.flatMap(p => Seq(4, p)) :+ 5 // clear before each root, then EOI
      val bits = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var acc = 0; var n = 0
      codes.foreach { c =>
        acc |= (c & 7) << n; n += 3
        while (n >= 8) { bits += (acc & 0xff).toByte; acc >>= 8; n -= 8 }
      }
      if (n > 0) bits += (acc & 0xff).toByte
      b(bits.length)     // one sub-block (≤ 255 here)
      buf ++= bits
      b(0)               // terminator
    }
    // frame 1: GCE disposal=2, no transparency
    b(0x21); b(0xf9); b(4); b(2 << 2); u16(0); b(0); b(0)
    b(0x2c); u16(0); u16(0); u16(8); u16(8); b(0) // full canvas, no LCT
    lzwBlock(Seq.fill(64)(1))                     // all color 1 (=100)
    // frame 2: GCE transparency on index 3
    b(0x21); b(0xf9); b(4); b(1); u16(0); b(3); b(0)
    b(0x2c); u16(2); u16(2); u16(4); u16(4); b(0) // 4×4 rect at (2,2)
    lzwBlock((0 until 16).map(i => if ((i + i / 4) % 2 == 0) 2 else 3))
    b(0x3b) // trailer
    val anim = GifDecode.decodeFrames(buf.toArray)
    assert(anim.frames.length == 2)
    assert(anim.canvases(0).forall(_ == 100), "frame 1: solid color 1")
    assert(anim.frames(1).delayCs == 0 && anim.frames(0).disposal == 2)
    // frame 2 canvas: background 10 everywhere (disposal 2 wiped frame
    // 1) except the rect's NON-transparent checkerboard cells = 200
    val cv = anim.canvases(1)
    for (y <- 0 until 8; x <- 0 until 8) {
      val inRect = x >= 2 && x < 6 && y >= 2 && y < 6
      val expected =
        if (!inRect) 10
        else {
          val i = (y - 2) * 4 + (x - 2)
          if ((i + i / 4) % 2 == 0) 200 else 10 // transparent → bg shows
        }
      assert(cv(y * 8 + x) == expected, s"($x,$y): ${cv(y * 8 + x)} != $expected")
    }
  }

  test("GIF decode rejects corrupt streams loudly") {
    import MultimodalOps.MediaCodec
    val gif = MediaCodec.encodeGif(
      MediaCodec.decodePng(MediaCodec.encodePng(5L, 32, 16)))
    intercept[IllegalArgumentException] {
      GifDecode.decode("nope".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { GifDecode.decode(gif.take(12)) }
    // a truncated LZW payload must fail the pixel-count contract,
    // never return a silently short raster
    val cut = gif.take(gif.length - 8) ++ Array(0.toByte, 0x3b.toByte)
    intercept[IllegalArgumentException] { GifDecode.decode(cut) }
  }

  test("mm_jpeg_decode row: bands hold on every image doc") {
    val out = SparkEntryAccess.query("mm_jpeg_decode")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (16 * (id % 4 + 1)).toInt)
      assert(r.getInt(2) == (16 * (id % 5 + 1)).toInt)
      assert(r.getBoolean(3) && r.getBoolean(4), s"band blown on doc $id")
    }
  }

  test("mm_audio_vad: driver replay from the PCM closed form; segment stats consistent") {
    val rows = SparkEntryAccess.query("mm_audio_vad")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (400 + id % 200).toInt
      val nf = (n + 63) / 64
      val energies = (0 until nf).map { f =>
        (f * 64 until math.min(f * 64 + 64, n)).map { i =>
          val s = ((id * 1103515245L + i * 12345L) % 65536L) - 32768L
          s * s
        }.sum
      }
      val tot = energies.sum
      val act = energies.map(e => e * nf > tot)
      val runs = act.foldLeft(List.empty[Int]) {
        case (h :: t, true) => (h + 1) :: t
        case (acc, true)    => 1 :: acc
        case (acc, false)   => 0 :: acc
      }
      assert(r.getInt(1) == nf, s"doc $id n_frames")
      assert(r.getLong(2) == tot, s"doc $id total_energy")
      assert(r.getInt(3) == act.count(identity), s"doc $id n_active")
      assert(r.getInt(4) == act.indexWhere(identity), s"doc $id first_active")
      assert(r.getInt(5) == (if (runs.isEmpty) 0 else runs.max), s"doc $id max_run")
      // the mean threshold is non-degenerate: some frames above, some below
      assert(r.getInt(3) > 0 && r.getInt(3) < nf, s"doc $id VAD degenerate")
    }
  }

  test("exif codec: round trip across field ranges; inline vs out-of-line honored") {
    for (id <- Seq(0L, 3L, 6L, 27L, 999999L)) {
      val enc = ExifCodec.encode(16 * (id % 4 + 1), 16 * (id % 5 + 1),
        s"cam${id % 5}", (id % 8 + 1).toInt, (100 * (id % 16 + 1)).toInt,
        f"2021:06:${id % 28 + 1}%02d 08:30:00")
      val e = ExifCodec.decode(enc)
      assert(e.width == 16 * (id % 4 + 1) && e.height == 16 * (id % 5 + 1))
      assert(e.make == s"cam${id % 5}")
      assert(e.orientation == (id % 8 + 1).toInt)
      assert(e.iso == (100 * (id % 16 + 1)).toInt)
      assert(e.datetime == f"2021:06:${id % 28 + 1}%02d 08:30:00")
    }
    // a long Make round-trips through the out-of-line path untruncated
    val long = ExifCodec.encode(640, 480, "NIKON CORPORATION Z9", 1, 64,
      "2024:12:31 23:59:59")
    assert(ExifCodec.decode(long).make == "NIKON CORPORATION Z9")
  }

  test("exif decoder walks a hand-built BIG-ENDIAN stream (the encoder only writes LE)") {
    // minimal MM stream: IFD0 {width SHORT inline, height SHORT inline,
    // Make ASCII out-of-line, orientation, ExifIFD ptr} + sub-IFD
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u16(v: Int): Unit = { buf += ((v >> 8) & 0xff).toByte; buf += (v & 0xff).toByte }
    def u32(v: Long): Unit = { u16(((v >> 16) & 0xffff).toInt); u16((v & 0xffff).toInt) }
    buf ++= "Exif".getBytes; buf += 0; buf += 0
    buf ++= "MM".getBytes; u16(42); u32(8L)
    // IFD0: 5 entries -> ends at 8 + 2 + 60 + 4 = 74; sub at 74 ends 104
    u16(5)
    def entry(tag: Int, typ: Int, cnt: Long, short: Option[Int], long: Option[Long]): Unit = {
      u16(tag); u16(typ); u32(cnt)
      short match {
        case Some(v) => u16(v); u16(0) // SHORT inline: first 2 of 4 bytes
        case None => u32(long.get)
      }
    }
    entry(0x0100, 3, 1, Some(800), None)   // width as SHORT: decoder must accept
    entry(0x0101, 3, 1, Some(600), None)
    entry(0x010f, 2, 6, None, Some(104L))  // "tester" NUL -> wait 6 bytes: "teste\0"
    entry(0x0112, 3, 1, Some(5), None)
    entry(0x8769, 4, 1, None, Some(74L))
    u32(0L)
    u16(2)
    entry(0x8827, 3, 1, Some(320), None)
    entry(0x9003, 2, 20, None, Some(110L))
    u32(0L)
    buf ++= "teste".getBytes; buf += 0
    buf ++= "2019:01:02 03:04:05".getBytes; buf += 0
    val e = ExifCodec.decode(buf.toArray)
    assert(e.width == 800 && e.height == 600)
    assert(e.make == "teste" && e.orientation == 5 && e.iso == 320)
    assert(e.datetime == "2019:01:02 03:04:05")
  }

  test("exif decoder rejects corrupt payloads loudly") {
    val good = ExifCodec.encode(64, 32, "cam1", 1, 200, "2021:06:05 08:30:00")
    intercept[IllegalArgumentException](ExifCodec.decode(good.take(10)))     // truncated
    val badMagic = good.clone(); badMagic(8) = 41
    intercept[IllegalArgumentException](ExifCodec.decode(badMagic))
    val badOrder = good.clone(); badOrder(6) = 'X'
    intercept[IllegalArgumentException](ExifCodec.decode(badOrder))
    val noPreamble = good.clone(); noPreamble(0) = 'B'
    intercept[IllegalArgumentException](ExifCodec.decode(noPreamble))
    // an out-of-line offset pointing past the buffer must be caught
    val badOff = good.clone()
    // Make entry value field sits at TIFF offset 34+8=42 -> absolute 6+42=48
    badOff(48) = 0xff.toByte; badOff(49) = 0xff.toByte
    intercept[IllegalArgumentException](ExifCodec.decode(badOff))
    // a crafted count near 2^32 must reject AT IFD-WALK time, not wrap
    // typeSize*cnt through toInt into a degenerate 1-byte check (the
    // count field of IFD0 entry 0 sits at TIFF offset 10+4=14 -> abs 20;
    // entries are LE, so four 0xff bytes = cnt 4294967295)
    val hugeCnt = good.clone()
    for (i <- 20 until 24) hugeCnt(i) = 0xff.toByte
    val ex = intercept[IllegalArgumentException](ExifCodec.decode(hugeCnt))
    assert(ex.getMessage.contains("value bytes"), s"wrong rejection: ${ex.getMessage}")
  }

  test("MJPEG demux: frame count, per-frame ImageIO agreement, segment-walk robustness") {
    import MultimodalOps.MediaCodec
    for (docId <- Seq(2L, 5L, 11L, 29L)) {
      val nf = (docId % 30 + 1).toInt
      val mj = MediaCodec.encodeMjpeg(docId, nf)
      val frames = MediaCodec.mjpegFrames(mj)
      assert(frames.length == nf, s"doc $docId demuxed ${frames.length}/$nf")
      // bytes round-trip: the demux is a partition of the stream
      assert(frames.map(_.length).sum == mj.length)
      val (w, h) = MediaCodec.videoDims(docId)
      frames.zipWithIndex.foreach { case (fb, f) =>
        val ours = JpegDecode.decode(fb)
        val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
        assert((ours.width, ours.height) == (w, h))
        for (y <- 0 until h; x <- 0 until w)
          assert(math.abs(ours.pixels(y * w + x) -
            ref.getRaster.getSample(x, y, 0)) <= 1,
            s"doc $docId frame $f ($x,$y) vs ImageIO")
      }
    }
    // segment-walk soundness: plant an FF D9 byte pair INSIDE a DQT
    // payload — a byte-scanning demux would split the frame there; the
    // length-directed walk must still frame the stream as ONE frame
    val one = MediaCodec.mjpegFrames(MediaCodec.encodeMjpeg(2L, 1)).head
    val patched = one.clone()
    var i = 2
    var dqtAt = -1
    while (dqtAt < 0 && i + 3 < patched.length) {
      val m = ((patched(i) & 0xff) << 8) | (patched(i + 1) & 0xff)
      if (m == 0xffdb) dqtAt = i
      else i += 2 + (((patched(i + 2) & 0xff) << 8) | (patched(i + 3) & 0xff))
    }
    assert(dqtAt > 0, "fixture lacks a DQT segment")
    patched(dqtAt + 10) = 0xff.toByte
    patched(dqtAt + 11) = 0xd9.toByte
    assert(MediaCodec.mjpegFrames(patched).length == 1,
      "demux split a frame on an FF D9 inside a DQT payload")
    // truncation rejects loudly
    intercept[IllegalArgumentException] {
      MediaCodec.mjpegFrames(mjTrunc(MediaCodec.encodeMjpeg(5L, 3)))
    }
  }

  private def mjTrunc(b: Array[Byte]): Array[Byte] = b.take(b.length - 4)

  test("mm_mjpeg_frames row: demux structure exact, decode bands hold on every video doc") {
    val rows = SparkEntryAccess.query("mm_mjpeg_frames")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 30 + 1).toInt, s"doc $id frame count")
      assert(r.getInt(2) == (4 * (id % 4 + 1)).toInt &&
        r.getInt(3) == (4 * (id % 3 + 1)).toInt, s"doc $id dims")
      assert(r.getBoolean(4) && r.getBoolean(5), s"doc $id decode bands")
    }
  }
}

/** Test access to the registered query map without duplicating wiring. */
object SparkEntryAccess {
  def query(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries(name)
}
