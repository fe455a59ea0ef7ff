package graft.gdx

import java.io.{BufferedInputStream, BufferedOutputStream, DataOutputStream, File, FileInputStream, FileOutputStream, OutputStream}
import java.util.zip.{Deflater, DeflaterOutputStream}

import scala.collection.mutable

/** Streaming single-symbol GDX shard encoder.
  *
  * The DSv2 sharded write path previously buffered every row of a task's
  * partition in an ArrayBuffer before encoding in commit() — executor
  * memory O(partition size), at odds with the 100 TB stance. Here
  * records are delta-encoded to a spill file AS THEY ARRIVE, so task
  * memory is O(distinct labels + set texts) (the UEL dictionary, which
  * the GDX format genuinely requires a pre-pass for), independent of
  * record count.
  *
  * Constraint handled: the blob layout (GdxCodec) puts the set-text pool
  * FIRST inside the deflate stream, but texts are only discovered while
  * streaming. Records therefore spill uncompressed in final record
  * encoding; finish() pushes pool + spilled records through one deflater
  * into a second temp, then assembles the final shard
  * (header | uels | meta | dataLen | blob) by sequential stream-copy.
  * Disk cost: two extra sequential passes over the shard.
  *
  * Input rows are expected in GDX key order — guaranteed on the write
  * path by RequiresDistributionAndOrdering (GdxWrite) — which is what
  * makes the shard's manifest [lo, hi] label range tight. Record order
  * in the shard is that LABEL order; it coincides with UEL-index order
  * (and the output is byte-identical to GdxCodec.write) for dim ≤ 1,
  * while deeper dims may interleave index order when a label was first
  * seen under an earlier leading group. Decode never assumes index
  * order, and delta encoding is order-agnostic (GdxCodecSpec property).
  */
final class GdxStreamEncoder(finalPath: String, name: String, typ: Int, dim: Int,
    explText: String = "", userInfo: Int = 0, domains: Seq[String] = Nil,
    producer: String = "gdxpyspark", compress: Boolean = true,
    tempTag: String = "") {

  private val uels = mutable.ArrayBuffer.empty[String]
  private val uelIndex = mutable.HashMap.empty[String, Int] // lower-cased key
  private val textPool = mutable.LinkedHashMap.empty[String, Int]

  private val tmpRecords = File.createTempFile("gdx-spill-", ".rec")
  private val rec = new DataOutputStream(
    new BufferedOutputStream(new FileOutputStream(tmpRecords), 1 << 16))
  private var prev: Array[Int] = null
  private var count = 0
  private var loLabel: String = null
  private var hiLabel: String = null

  private def registerUel(label: String): Int = {
    require(label.length <= 63, s"UEL label longer than 63 chars: $label")
    uelIndex.getOrElseUpdate(label.toLowerCase(java.util.Locale.ROOT), { uels += label; uels.size - 1 })
  }

  def add(labels: Array[String], values: Array[Double], text: Option[String]): Unit = {
    require(labels.length == dim, s"record arity ${labels.length} != dim $dim for $name")
    val keys = new Array[Int](dim)
    var i = 0
    while (i < dim) { keys(i) = registerUel(labels(i)); i += 1 }
    if (dim > 0) {
      val l0 = labels(0).toLowerCase(java.util.Locale.ROOT)
      if (loLabel == null || l0 < loLabel) loLabel = l0
      if (hiLabel == null || l0 > hiLabel) hiLabel = l0
    }
    val first =
      if (prev == null) 0
      else { var j = 0; while (j < dim && prev(j) == keys(j)) j += 1; j }
    rec.writeByte(first)
    i = first
    while (i < dim) { GdxCodec.writeVarInt(rec, keys(i)); i += 1 }
    typ match {
      case SymbolType.Set | SymbolType.Alias =>
        GdxCodec.writeVarInt(rec,
          text.map(t => textPool.getOrElseUpdate(t, textPool.size) + 1).getOrElse(0))
      case SymbolType.Parameter =>
        rec.writeDouble(if (values.nonEmpty) values(0) else 0.0)
      case _ =>
        var f = 0
        while (f < 5) { rec.writeDouble(if (f < values.length) values(f) else 0.0); f += 1 }
    }
    prev = keys
    count += 1
  }

  def records: Long = count.toLong
  def labelRange: (Option[String], Option[String]) = (Option(loLabel), Option(hiLabel))

  /** Deflate pool + spilled records, assemble the shard file, delete
    * temps. The shard is assembled under a `.inprogress` suffix and
    * atomically renamed into place, so directory listers (the batch
    * reader's shardsOf glob AND the file-arrival micro-batch stream)
    * never observe a torn shard — a shard either exists completely or
    * not at all.
    */
  def finish(): Unit = {
    rec.close()
    val tmpBlob = File.createTempFile("gdx-spill-", ".blob")
    var fullyWritten = false
    try {
      val rawOut: OutputStream =
        new BufferedOutputStream(new FileOutputStream(tmpBlob), 1 << 16)
      val d = new DataOutputStream(
        if (compress) new DeflaterOutputStream(rawOut, new Deflater(Deflater.BEST_SPEED))
        else rawOut)
      GdxCodec.writeVarInt(d, textPool.size)
      textPool.keys.foreach(d.writeUTF)
      copyTo(tmpRecords, d)
      d.close()
      val blobLen = tmpBlob.length()
      require(blobLen <= Int.MaxValue,
        s"gdx shard blob exceeds 2 GiB ($blobLen bytes) — lower records per shard")
      val out = new DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(inProgress), 1 << 16))
      try {
        out.write(GdxCodec.Magic)
        out.writeUTF(producer)
        out.writeBoolean(compress)
        GdxCodec.writeVarInt(out, uels.size)
        uels.foreach(out.writeUTF)
        GdxCodec.writeVarInt(out, 1) // one symbol per shard
        out.writeUTF(name)
        out.writeUTF(explText)
        out.writeByte(typ)
        out.writeByte(dim)
        GdxCodec.writeVarInt(out, userInfo)
        val doms = if (domains.size == dim) domains else Seq.fill(dim)("*")
        doms.foreach(out.writeUTF)
        GdxCodec.writeVarInt(out, count)
        GdxCodec.writeVarInt(out, blobLen.toInt)
        copyTo(tmpBlob, out)
      } finally out.close()
      // idempotent epoch re-run overwrites its own shard ATOMICALLY:
      // a window with no file at finalPath would make a committedOnly
      // reader replaying a manifest-recorded offset throw
      // committed-data-lost (and a listing reader silently skip the
      // shard). publishAtomically carries the full fallback
      // discipline: capability-exception-only fallback, no manual
      // delete+rename pair, transient errors propagate with dst
      // intact, and on publish failure the in-progress file is the
      // only copy of the shard — the finally below must not remove it.
      fullyWritten = true
      GdxCodec.publishAtomically(inProgress, new File(finalPath))
    } finally {
      tmpRecords.delete()
      tmpBlob.delete()
      if (!fullyWritten) inProgress.delete()
    }
  }

  // tempTag makes the in-progress path attempt-unique when several task
  // attempts race toward the same deterministic finalPath (streaming
  // epochs): each assembles privately; the atomic rename is last-wins
  private def inProgress: File = new File(finalPath + ".inprogress" + tempTag)

  /** Abandon the stream and remove temp files (task abort path). */
  def dispose(): Unit = {
    try rec.close() catch { case _: Throwable => () }
    tmpRecords.delete()
    inProgress.delete()
  }

  private def copyTo(src: File, out: OutputStream): Unit = {
    val in = new BufferedInputStream(new FileInputStream(src), 1 << 16)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
  }
}
