package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.{QueryModule, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal columns (builder mandate, SURVEY §2.L-adjacent): media is
  * carried as an opaque `binary` payload column plus a typed metadata
  * struct; decode / feature-extract / resize / frame-sample are the
  * operators a training-data pipeline runs over it.
  *
  * The IMAGE path is REAL: payloads are actual PNG files encoded with
  * the JVM-builtin `javax.imageio`, and every image operator decodes
  * the bytes and computes from the raster — `mm_decode_meta` parses
  * true width/height/mean, `mm_resize` decodes → exact 2×2 area-average
  * resample → re-encodes PNG → re-decodes to report pixel-derived
  * values. Because the fixture's pixel function is a closed form of
  * (doc_id, x, y), the DuckDB oracle reproduces every pixel-derived
  * number without any image library — the decode is verified, not
  * trusted. Audio/video payloads stay opaque binary + metadata (no
  * codec in the JVM stdlib; the plumbing — schema, batched
  * mapPartitions, Generator frame explode — is identical).
  *
  * Scale: all operators are embarrassingly parallel over rows — no
  * shuffle except explicit output ordering; decode/extract hold
  * per-batch state only, so executor memory is O(batch), not
  * O(partition).
  */
object MultimodalOps extends QueryModule {

  // ------------------------------------------------------- media codec

  /** Real PNG codec over a deterministic gray raster. The pixel value
    * is a closed form of (doc_id, x, y) so oracles can recompute it;
    * everything between — PNG encode, decode, resample — is the real
    * `javax.imageio` + raster arithmetic a production image pipeline
    * runs (swap `pixel` for camera bytes and nothing else changes).
    */
  object MediaCodec {
    /** Gray value at (x, y) of doc `docId`'s image — the ONLY synthetic
      * piece, shared verbatim with the DuckDB oracles.
      */
    def pixel(docId: Long, x: Int, y: Int): Int =
      ((31L * docId + 7L * x + 13L * y) % 256L).toInt

    def encodePng(docId: Long, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { r.setSample(x, y, 0, pixel(docId, x, y)); x += 1 }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def decodePng(bytes: Array[Byte]): BufferedImage =
      ImageIO.read(new ByteArrayInputStream(bytes))

    def meanPixel(img: BufferedImage): Double = {
      val r = img.getRaster
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += r.getSample(x, y, 0); x += 1 }
        y += 1
      }
      sum.toDouble / (img.getWidth.toLong * img.getHeight)
    }

    /** Exact 2×2 area-average downsample (integer floor) — a real
      * resampling kernel with a closed-form result the oracle mirrors.
      */
    def halve(img: BufferedImage): BufferedImage = {
      val w2 = img.getWidth / 2
      val h2 = img.getHeight / 2
      val out = new BufferedImage(w2, h2, BufferedImage.TYPE_BYTE_GRAY)
      val ri = img.getRaster
      val ro = out.getRaster
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          val s = ri.getSample(2 * x, 2 * y, 0) + ri.getSample(2 * x + 1, 2 * y, 0) +
            ri.getSample(2 * x, 2 * y + 1, 0) + ri.getSample(2 * x + 1, 2 * y + 1, 0)
          ro.setSample(x, y, 0, s / 4)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Fixed-dim embedding from the decoded raster: slot k accumulates
      * pixel i (row-major) with i ≡ k (mod dim), in double, cast to
      * float once — accumulation-order-independent, so the value is
      * engine-reproducible.
      */
    def features(img: BufferedImage, dim: Int): Array[Float] = {
      val acc = new Array[Double](dim)
      val r = img.getRaster
      val w = img.getWidth
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < w) { acc((y * w + x) % dim) += r.getSample(x, y, 0) / 255.0; x += 1 }
        y += 1
      }
      acc.map(_.toFloat)
    }
  }

  // ----------------------------------------------------- media table

  final case class DocRow(doc_id: Long, text: String)
  final case class MediaFull(doc_id: Long, payload: Array[Byte], kind: String,
      width: Int, height: Int, n_frames: Int)

  /** Media table synthesized deterministically from `documents`: image
    * rows carry a REAL PNG of the doc's raster; audio/video carry the
    * UTF-8 text bytes as an opaque stand-in payload. In production this
    * is the ingestion job's output; the operators below never look at
    * `documents` again — and like a real ingestion output it is
    * materialized ONCE per dataset (parquet in tmp, like
    * GdxOps.ensureFixtures), so the four mm_* queries and the bench
    * reps measure decode work, not repeated PNG synthesis. Content is
    * a pure function of the sfDir's `documents`, so a directory left
    * by an earlier JVM is identical and safely reused.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    s.read.parquet(ensureMediaFixture(s, d))

  private val mediaLock = new Object

  private def ensureMediaFixture(s: SparkSession, d: String): String =
    mediaLock.synchronized {
      // key by the FULL canonical path, not the basename: two datasets
      // named "sf0.1" under different parents must not share a fixture
      val canon = new java.io.File(d).getCanonicalPath
      val key = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(canon).toLong & 0xffffffffL)
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-media-" +
        s"${new java.io.File(d).getName}-$key"
      // _SUCCESS marks a complete write; a half-written dir is rewritten
      if (!new java.io.File(dir, "_SUCCESS").isFile)
        synthesizeMedia(s, d).write.mode("overwrite").parquet(dir)
      dir
    }

  private def synthesizeMedia(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T(s, d, "documents").select(col("doc_id"), col("text")).as[DocRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val kind = (r.doc_id % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val w = (16 * (r.doc_id % 4 + 1)).toInt
          val h = (16 * (r.doc_id % 3 + 1)).toInt
          val payload =
            if (kind == "image") MediaCodec.encodePng(r.doc_id, w, h)
            else r.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MediaFull(r.doc_id, payload, kind, w, h, (r.doc_id % 30 + 1).toInt)
        }
      }
      .toDF()
      .select(col("doc_id"), col("payload"),
        struct(col("kind"), col("width"), col("height"), col("n_frames")).as("meta"))
  }

  // shared by the image-operator oracles: per-image-doc dims
  private val imDimsSql =
    """im AS (SELECT doc_id, 16*(doc_id%4+1) AS w, 16*(doc_id%3+1) AS h
      |       FROM documents WHERE doc_id % 3 = 0)""".stripMargin

  // ---------------------------------------------------------- decode

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedMeta(doc_id: Long, width: Int, height: Int, mean_px: Double)

  /** Batched decode — the mapInPandas shape: partition iterator →
    * fixed-size batches → per-batch decode → flat iterator out.
    * Partitioning preserved; per-partition setup (a codec pool) would
    * go where the comment is.
    */
  def decodeMeta(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup (decoder/codec pool) goes here
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val img = MediaCodec.decodePng(r.payload)
            DecodedMeta(r.doc_id, img.getWidth, img.getHeight,
              math.rint(MediaCodec.meanPixel(img) * 1e6) / 1e6)
          }
        }
      }
      .toDF()
  }

  /** Decode-stage metadata from the ACTUAL bytes: width/height/mean all
    * come from `ImageIO.read` of the payload, and the oracle recomputes
    * them from the pixel closed form — a wrong decode cannot pass.
    */
  q("mm_decode_meta",
    s"""WITH $imDimsSql
       |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       |  round(list_sum([CAST((31*doc_id + 7*(i%w) + 13*(i//w)) % 256 AS DOUBLE)
       |                  FOR i IN range(0, w*h)]) / (w*h), 6) AS mean_px
       |FROM im ORDER BY doc_id""".stripMargin) { (s, d) =>
    decodeMeta(mediaTable(s, d).filter(col("meta.kind") === "image"))
      .orderBy("doc_id") // one row per image doc = input-sized
  }

  // ------------------------------------------------- feature extract

  final case class FeatureRow(doc_id: Long, features: Array[Float])

  /** mapPartitions with explicit batching — the JVM shape of
    * `mapInPandas`: the "model" here is the real PNG decoder + raster
    * fold; an ONNX session would drop into the same slot. Fixed-dim
    * `array<float>` output feeds the §2.L similarity operators as-is.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup (load model once) goes here
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val img = MediaCodec.decodePng(r.payload)
            FeatureRow(r.doc_id, MediaCodec.features(img, dim))
          }
        }
      }
      .toDF()
  }

  q("mm_feature_extract",
    s"""WITH $imDimsSql
       |SELECT doc_id, CAST(16 AS INTEGER) AS dim,
       |  round(CAST(CAST(list_sum([CAST((31*doc_id + 7*(i%w) + 13*(i//w)) % 256 AS DOUBLE)/255.0
       |                            FOR i IN range(0, w*h) IF i % 16 = 0]) AS FLOAT) AS DOUBLE), 4) AS f0
       |FROM im ORDER BY doc_id""".stripMargin) { (s, d) =>
    extractFeatures(mediaTable(s, d).filter(col("meta.kind") === "image"))
      .select(col("doc_id"), size(col("features")).as("dim"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
      .orderBy("doc_id") // one row per image doc = input-sized
  }

  // ----------------------------------------------------------- resize

  /** REAL resize: decode the payload, 2×2 area-average to half dims,
    * re-encode as PNG, then DECODE THE RESIZED BYTES AGAIN and report
    * their width/height/mean — so the oracle (closed-form floor-average
    * of the pixel function) verifies the whole decode→resample→encode→
    * decode loop end-to-end.
    */
  def resizeHalf(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val resizedBytes = {
              val img = MediaCodec.decodePng(r.payload)
              val half = MediaCodec.halve(img)
              val out = new ByteArrayOutputStream()
              ImageIO.write(half, "png", out)
              out.toByteArray
            }
            val back = MediaCodec.decodePng(resizedBytes) // re-decode: prove the bytes
            DecodedMeta(r.doc_id, back.getWidth, back.getHeight,
              math.rint(MediaCodec.meanPixel(back) * 1e6) / 1e6)
          }
        }
      }
      .toDF()
  }

  q("mm_resize",
    s"""WITH $imDimsSql,
       |     rs AS (SELECT doc_id, w, w//2 AS w2, h//2 AS h2 FROM im)
       |SELECT doc_id, CAST(w2 AS INTEGER) AS width, CAST(h2 AS INTEGER) AS height,
       |  round(list_sum([CAST((
       |      (31*doc_id + 7*(2*(i%w2))   + 13*(2*(i//w2)))   % 256
       |    + (31*doc_id + 7*(2*(i%w2)+1) + 13*(2*(i//w2)))   % 256
       |    + (31*doc_id + 7*(2*(i%w2))   + 13*(2*(i//w2)+1)) % 256
       |    + (31*doc_id + 7*(2*(i%w2)+1) + 13*(2*(i//w2)+1)) % 256) // 4 AS DOUBLE)
       |    FOR i IN range(0, w2*h2)]) / (w2*h2), 6) AS mean_px
       |FROM rs ORDER BY doc_id""".stripMargin) { (s, d) =>
    resizeHalf(mediaTable(s, d).filter(col("meta.kind") === "image"))
      .orderBy("doc_id") // one row per image doc = input-sized
  }

  // ------------------------------------------------ features → ANN

  /** Global plane ids 900+p — disjoint from every text-ANN plane range. */
  private def mmPlane(p: Int): Int = 900 + p

  private val MmAnnPlanes = 4
  private val FeatDim = 16

  private def featBucketExpr: org.apache.spark.sql.Column =
    LlmOps.signBucketExpr(col("features"), FeatDim, (0 until MmAnnPlanes).map(mmPlane))

  private def mmAnnOracleSql: String = {
    val bucket = (0 until MmAnnPlanes).map { p =>
      s"CASE WHEN list_inner_product(feat, " +
        s"[${LlmOps.planeComps(mmPlane(p), FeatDim).mkString(", ")}]) > 0 " +
        "THEN '1' ELSE '0' END"
    }.mkString("concat(", ", ", ")")
    s"""WITH $imDimsSql,
       |     f AS (SELECT doc_id,
       |       [CAST(CAST(list_sum([CAST((31*doc_id + 7*(i%w) + 13*(i//w)) % 256 AS DOUBLE)/255.0
       |                            FOR i IN range(0, w*h) IF i % $FeatDim = k]) AS FLOAT) AS DOUBLE)
       |        FOR k IN range(0, $FeatDim)] AS feat
       |       FROM im),
       |     bk AS (SELECT doc_id, feat, $bucket AS bucket FROM f),
       |     j AS (SELECT l.doc_id AS qid, r.doc_id AS nbr,
       |                  round(list_cosine_similarity(l.feat, r.feat), 6) AS cos
       |           FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.doc_id <> r.doc_id)
       |SELECT qid, nbr, cos, rn FROM (
       |  SELECT qid, nbr, cos,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rn
       |  FROM j) t
       |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }

  /** The multimodal-training-pipeline shape end-to-end: decode media
    * payloads → fixed-dim `array<float>` features ([[extractFeatures]],
    * the "model inference" slot) → hyperplane-LSH bucket → in-bucket
    * cosine top-k — the same ANN join the text embeddings use
    * (LlmOps sim_ann_lsh), now fed by the image path. The pixel closed
    * form makes the features oracle-computable, so the WHOLE
    * composition (PNG decode → feature fold → float cast → bucketing →
    * ranked neighbors) is hash-checked against DuckDB.
    */
  q("mm_ann_topk", mmAnnOracleSql) { (s, d) =>
    val feats = extractFeatures(mediaTable(s, d).filter(col("meta.kind") === "image"))
    // materialize (doc_id, features, bucket) ONCE before the self-join:
    // the typed mapPartitions decode stage is an object plan, which
    // defeats exchange-reuse canonicalization — without this the PNG
    // decode + feature fold would run once PER JOIN SIDE at every
    // scale (verified in PlanInvariantsSpec; the expression-only LSH
    // queries, by contrast, self-heal via ReusedExchange). The frame
    // is |image docs| × (8 B + dim floats + bucket) — tiny next to the
    // payloads — and Bench/Verify release the blocks between queries.
    val b = feats.withColumn("bucket", featBucketExpr).localCheckpoint()
    val l = b.select(col("bucket"), col("doc_id").as("qid"), col("features").as("qf"))
    val r = b.select(col("bucket"), col("doc_id").as("nbr"), col("features"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nbr").asc)
    l.join(r, Seq("bucket"))
      .filter(col("qid") =!= col("nbr"))
      .withColumn("cos", round(graft.functions.vec.cosine(col("qf"), col("features")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("qid", "nbr", "cos", "rn")
      .orderBy("qid", "rn") // top-k per image doc = input-sized
  }

  // ------------------------------------------------ perceptual dedup

  final case class HashedImage(doc_id: Long, hi: Long, lo: Long)

  /** dHash (difference hash) of a decoded raster — the standard
    * perceptual image fingerprint web-scale curation pipelines use for
    * image near-dup (LAION-style): sample a 9×8 grid (nearest-neighbor
    * positions `xi·w/9`, `yi·h/8` — closed-form, so the oracle can
    * recompute it), one bit per horizontally adjacent sample
    * comparison, bit index y·8+x. Carried as two NON-NEGATIVE 32-bit
    * halves (lo = bits 0–31, hi = bits 32–63): both engines then
    * compare with codegen'd integer `bit_count(xor)` — no per-pair
    * string/HOF work, and no 64-bit sign-wrap edge in the oracle's
    * integer construction.
    */
  def dHash64(img: BufferedImage): (Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    val r = img.getRaster
    var hi = 0L
    var lo = 0L
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 8) {
        val s0 = r.getSample(x * w / 9, sy, 0)
        val s1 = r.getSample((x + 1) * w / 9, sy, 0)
        if (s1 > s0) {
          val i = y * 8 + x
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  /** (doc_id, hi, lo) over image payloads — batched decode, same
    * mapPartitions shape as [[extractFeatures]].
    */
  def phashes(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { r =>
          val (hi, lo) = dHash64(MediaCodec.decodePng(r.payload))
          HashedImage(r.doc_id, hi, lo)
        })
      }
      .toDF()
  }

  // bit j of the dHash in the pixel closed form: compare the two
  // nearest-neighbor samples of row j/8 at columns j%8 and j%8+1
  private def phashOracleSql: String = {
    def cmp(col: String, row: String) =
      s"(31*doc_id + 7*((($col)+1)*w//9) + 13*(($row)*h//8)) % 256" +
        s" > (31*doc_id + 7*(($col)*w//9) + 13*(($row)*h//8)) % 256"
    s"""WITH $imDimsSql,
       |     ph AS (SELECT doc_id,
       |       CAST(list_sum([CASE WHEN ${cmp("i%8", "i//8")}
       |                      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
       |                      FOR i IN range(0, 32)]) AS BIGINT) AS lo,
       |       CAST(list_sum([CASE WHEN ${cmp("i%8", "i//8 + 4")}
       |                      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
       |                      FOR i IN range(0, 32)]) AS BIGINT) AS hi
       |       FROM im),
       |     bands AS (SELECT doc_id, hi, lo, t,
       |                      CASE WHEN t < 2 THEN (lo >> (16*t)) & 65535
       |                           ELSE (hi >> (16*(t-2))) & 65535 END AS bv
       |               FROM ph, unnest([0, 1, 2, 3]) AS u(t)),
       |     cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       |                     l.hi AS ha, l.lo AS la, r.hi AS hb, r.lo AS lb
       |              FROM bands l JOIN bands r
       |                ON l.t = r.t AND l.bv = r.bv AND l.doc_id < r.doc_id)
       |SELECT a, b, dist FROM (
       |  SELECT a, b, CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS INTEGER) AS dist
       |  FROM cand) t
       |WHERE dist <= 10 ORDER BY a, b""".stripMargin
  }

  /** Image near-dup via perceptual hash: decode → dHash → 4×16-bit
    * band buckets (two images within Hamming 10 share a band with ≤2
    * flips far more often than chance — the simhash/LSH banding rule)
    * → candidate equi-join → exact Hamming verify on candidates only.
    * Never all-pairs: candidates ∝ band-bucket density, and the verify
    * is two codegen'd `bit_count(xor)` calls per candidate. The oracle
    * recomputes the hash from the pixel closed form, so a wrong decode
    * or a wrong sample-grid cannot pass.
    */
  q("mm_phash_neardup", phashOracleSql) { (s, d) =>
    val ph = phashes(mediaTable(s, d).filter(col("meta.kind") === "image"))
      // object-plan decode stage: materialize once before the self-join
      // (same exchange-reuse defeat as mm_ann_topk)
      .localCheckpoint()
    val bands = ph.select(col("doc_id"), col("hi"), col("lo"),
      explode(array((0 until 4).map { t =>
        val bv =
          if (t < 2) shiftright(col("lo"), 16 * t).bitwiseAND(lit(65535L))
          else shiftright(col("hi"), 16 * (t - 2)).bitwiseAND(lit(65535L))
        struct(lit(t).as("t"), bv.as("bv"))
      }: _*)).as("bd"))
      .select(col("doc_id"), col("hi"), col("lo"),
        col("bd.t").as("t"), col("bd.bv").as("bv"))
    val l = bands.select(col("t"), col("bv"), col("doc_id").as("a"),
      col("hi").as("ha"), col("lo").as("la"))
    val r = bands.select(col("t"), col("bv"), col("doc_id").as("b"),
      col("hi").as("hb"), col("lo").as("lb"))
    l.join(r, Seq("t", "bv"))
      .filter(col("a") < col("b"))
      .select("a", "b", "ha", "la", "hb", "lb")
      .distinct()
      .withColumn("dist",
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("int"))
      .filter(col("dist") <= 10)
      .select("a", "b", "dist")
      .orderBy("a", "b") // near-dup pairs ∝ dup density = input-sized
  }

  // ------------------------------------------------ audio fingerprint

  final case class AudioFp(doc_id: Long, n_windows: Int, fp_min: Long, fp_xor: Long)

  /** Chromaprint-style audio fingerprint over the OPAQUE payload bytes
    * (the mandate's stubbed-decode slot: a real pipeline would decode
    * PCM frames first; the frame→hash plumbing below is what stays):
    * fixed 32-byte windows at stride 16 (short payloads = one whole
    * window), each window rolling-poly-hashed (the same byte fold as
    * the native `token_poly_hash`, mod 1e9+7), folded to a compact
    * (n_windows, min, xor) fingerprint. Min and xor are
    * order-independent, so the fold parallelizes trivially; the oracle
    * recomputes every window hash from the document text the audio
    * payload was synthesized from (byte == ord(char) for this ASCII
    * corpus), so the binary windowing is verified, not trusted.
    * Embarrassingly parallel: batched mapPartitions, zero shuffle.
    */
  def audioFingerprints(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    val Mod = 1000000007L
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { r =>
          val bytes = r.payload
          val len = bytes.length
          var p = 0
          var n = 0
          var mn = Long.MaxValue
          var xo = 0L
          val end = math.max(len - 31, 1)
          while (p < end) {
            val wEnd = math.min(p + 32, len)
            var h = 0L
            var i = p
            while (i < wEnd) { h = (h * 31 + (bytes(i) & 0xff)) % Mod; i += 1 }
            n += 1
            if (h < mn) mn = h
            xo ^= h
            p += 16
          }
          AudioFp(r.doc_id, n, mn, xo)
        })
      }
      .toDF()
  }

  q("mm_audio_fingerprint",
    """WITH au AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1),
      |     hs AS (SELECT doc_id,
      |       [list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(str_split(substr(text, p + 1, 32), ''),
      |                         c -> CAST(ord(c) AS BIGINT))),
      |          (a, b) -> (a * 31 + b) % 1000000007)
      |        FOR p IN range(0, greatest(len(text) - 31, 1), 16)] AS h
      |       FROM au)
      |SELECT doc_id, CAST(len(h) AS INTEGER) AS n_windows,
      |       list_min(h) AS fp_min,
      |       list_reduce(h, (a, b) -> xor(a, b)) AS fp_xor
      |FROM hs ORDER BY doc_id""") { (s, d) =>
    audioFingerprints(mediaTable(s, d).filter(col("meta.kind") === "audio"))
      .orderBy("doc_id") // one row per audio doc = input-sized
  }

  // ----------------------------------------------------- frame sample

  /** Every-5th-frame sampling for video rows: frame indices come from
    * `sequence` + `explode` (Generator — distributed, no driver loop);
    * the per-frame byte slice stands in for a real frame decode (no
    * video codec in the JVM stdlib).
    */
  q("mm_frame_sample",
    """SELECT doc_id, unnest(generate_series(0, CAST(doc_id % 30 AS BIGINT), 5)) AS frame_idx
      |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id, frame_idx""") { (s, d) =>
    mediaTable(s, d)
      .filter(col("meta.kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0L), (col("meta.n_frames") - 1).cast("long"), lit(5L)))
          .as("frame_idx"))
      .orderBy("doc_id", "frame_idx") // frames per video doc = input-sized
  }

  /** Video scene-cut detection (SPEC: the shot-boundary pass every
    * video-training pipeline runs before clip sampling — PySceneDetect
    * -style threshold detection): per frame a scalar content feature,
    * a cut wherever the feature jumps more than the threshold against
    * the previous frame; frame 0 always starts a scene. In production
    * the feature is the decoded frame's mean luma; no video codec
    * exists in the JVM stdlib (documented stub slot), so the feature
    * here is a deterministic byte probe into the opaque payload —
    * ascii(payload[(frame_idx·31) mod len]) — which keeps every piece
    * of Spark plumbing real (explode over metadata frame counts, ONE
    * per-video window for the lag delta, threshold filter) and lets
    * the oracle re-derive each frame feature from the text closed
    * form, so the plumbing is verified end to end. One doc_id shuffle;
    * output = scene starts ∝ cut density = input-sized.
    */
  q("mm_scene_cut",
    """WITH v AS (SELECT doc_id, text, len(text) AS L,
      |                  CAST(doc_id % 30 AS BIGINT) + 1 AS nf
      |           FROM documents WHERE doc_id % 3 = 2),
      |     fr AS (SELECT doc_id, unnest(generate_series(0, nf - 1)) AS frame_idx,
      |                   text, L
      |            FROM v),
      |     ft AS (SELECT doc_id, frame_idx,
      |                   ord(substr(text, CAST((frame_idx * 31) % L AS INT) + 1, 1)) AS f
      |            FROM fr),
      |     dl AS (SELECT doc_id, frame_idx, f,
      |                   f - lag(f) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS d
      |            FROM ft)
      |SELECT doc_id, frame_idx, f
      |FROM dl WHERE d IS NULL OR abs(d) > 24
      |ORDER BY doc_id, frame_idx""") { (s, d) =>
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    mediaTable(s, d)
      .filter(col("meta.kind") === "video")
      // payload is the synthesized UTF-8 text (the stub contract);
      // cast-to-string indexing = the byte probe the oracle mirrors
      .select(col("doc_id"), col("payload").cast("string").as("txt"),
        col("meta.n_frames").as("nf"))
      .select(col("doc_id"), col("txt"), length(col("txt")).as("L"),
        explode(sequence(lit(0L), (col("nf") - 1).cast("long"))).as("frame_idx"))
      .withColumn("f",
        expr("ascii(substring(txt, cast((frame_idx * 31) % L as int) + 1, 1))"))
      .withColumn("d", col("f") - lag(col("f"), 1).over(w))
      .filter(col("d").isNull || abs(col("d")) > 24)
      .select("doc_id", "frame_idx", "f")
      .orderBy("doc_id", "frame_idx") // scene starts ∝ cut density = input-sized
  }
}
