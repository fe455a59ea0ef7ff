package graft.ops

import graft.{QueryModule, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal columns (builder mandate, SURVEY §2.L-adjacent): media is
  * carried as an opaque `binary` payload column plus a typed metadata
  * struct; decode / feature-extract / resize / frame-sample are the
  * operators a training-data pipeline runs over it.
  *
  * The container has no image/audio codecs, so the byte-level decode in
  * [[MediaCodec]] is a clearly-marked DETERMINISTIC FAKE — but every
  * piece of Spark plumbing around it is real and is what would ship: the
  * schema (binary + struct metadata), partition-preserving batched
  * `mapPartitions` (the JVM analog of `mapInPandas` — per-batch
  * amortized "model" setup, fixed batch shape), fixed-dim
  * `array<float>` feature output ready for the §2.L similarity
  * operators, and frame explosion via `sequence`+`explode` (a
  * Generator) rather than any driver-side loop.
  *
  * Scale: all four operators are embarrassingly parallel over rows —
  * no shuffle except explicit output ordering; feature extraction
  * keeps batch state per partition, so executor memory is O(batch),
  * not O(partition).
  */
object MultimodalOps extends QueryModule {

  /** Media table synthesized deterministically from `documents`: payload
    * bytes are the UTF-8 text (stand-in for encoded media), metadata
    * derived from doc_id. In production this is the output of the
    * ingestion job; the operators below never look at `documents` again.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    T(s, d, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        (lit(16) * (pmod(col("doc_id"), lit(4)) + 1)).cast("int").as("width"),
        (lit(16) * (pmod(col("doc_id"), lit(3)) + 1)).cast("int").as("height"),
        (pmod(col("doc_id"), lit(30)) + 1).cast("int").as("n_frames"))
        .as("meta"))

  // ---------------------------------------------------------- decode

  /** Decode-stage metadata: byte length + content checksum + declared
    * dims. The real decoder would replace crc32 with header parsing;
    * byte length and the rest of the row shape are already what a real
    * pipeline emits. Oracle covers the non-stub columns.
    */
  q("mm_decode_meta",
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |       CAST(16 * (doc_id % 4 + 1) AS INTEGER) AS width,
      |       CAST(16 * (doc_id % 3 + 1) AS INTEGER) AS height
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    mediaTable(s, d).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))
      .reportSorted("doc_id")
  }

  // ------------------------------------------------- feature extract

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class FeatureRow(doc_id: Long, features: Array[Float])

  /** DETERMINISTIC FAKE "model": bytes → fixed-dim embedding. A real
    * pipeline swaps only this function (e.g. ONNX session created once
    * per partition, invoked per batch). Accumulates in double and casts
    * to float ONCE per slot — float-accumulation order would otherwise
    * make the value engine-dependent; this way the DuckDB oracle rounds
    * the bit-identical float64-of-float32 value.
    */
  private[ops] def fakeEmbed(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    acc.map(_.toFloat)
  }

  /** mapPartitions with explicit batching — the JVM shape of
    * `mapInPandas`: partition iterator → fixed-size batches → per-batch
    * inference → flat iterator out. Partitioning is preserved (no
    * shuffle); downstream similarity ops consume `features` directly.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup would go here (load model once)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map(r => FeatureRow(r.doc_id, fakeEmbed(r.payload, dim)))
        }
      }
      .toDF()
  }

  q("mm_feature_extract",
    """SELECT doc_id, CAST(16 AS INTEGER) AS dim,
      |  round(CAST(CAST(coalesce(list_sum([ord(substr(text, i, 1))/255.0
      |      FOR i IN range(1, length(text)+1) IF (i-1)%16 = 0]), 0) AS FLOAT) AS DOUBLE), 4) AS f0
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    extractFeatures(mediaTable(s, d))
      .select(col("doc_id"), size(col("features")).as("dim"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
      .reportSorted("doc_id")
  }

  // ----------------------------------------------------------- resize

  /** Resize stub: halves declared dims and truncates the payload
    * proportionally (??? in spirit — a real decoder resamples pixels;
    * the metadata arithmetic, column shapes and pure-projection plan
    * are the real part).
    */
  q("mm_resize",
    """SELECT doc_id, CAST(16*(doc_id%4+1)//2 AS INTEGER) AS width,
      |       CAST(16*(doc_id%3+1)//2 AS INTEGER) AS height,
      |       CAST(least(octet_length(encode(text)), 64) AS INTEGER) AS n_bytes
      |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""") { (s, d) =>
    mediaTable(s, d)
      .filter(col("meta.kind") === "image")
      .select(
        col("doc_id"),
        (col("meta.width") / 2).cast("int").as("width"),
        (col("meta.height") / 2).cast("int").as("height"),
        substring(col("payload"), 1, 64).as("payload"))
      .select(col("doc_id"), col("width"), col("height"),
        length(col("payload")).as("n_bytes"))
      .reportSorted("doc_id")
  }

  // ----------------------------------------------------- frame sample

  /** Every-5th-frame sampling for video rows: frame indices come from
    * `sequence` + `explode` (Generator — distributed, no driver loop);
    * the per-frame byte slice stands in for a real frame decode.
    */
  q("mm_frame_sample",
    """SELECT doc_id, unnest(generate_series(0, CAST(doc_id % 30 AS BIGINT), 5)) AS frame_idx
      |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id, frame_idx""") { (s, d) =>
    mediaTable(s, d)
      .filter(col("meta.kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0L), (col("meta.n_frames") - 1).cast("long"), lit(5L)))
          .as("frame_idx"))
      .reportSorted("doc_id", "frame_idx")
  }
}
