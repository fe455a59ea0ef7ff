package graft.gdx

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, DeflaterOutputStream, InflaterInputStream}

/** Binary codec for the graft GDX container.
  *
  * Structural features follow the GDX data-section design (SPEC
  * GAMS-dev/gdx; SURVEY.md §1.1): per-symbol sparse coordinate lists
  * with delta-encoded keys (only the first-changed dimension onward is
  * rewritten per record), one global ordered UEL table,
  * special-value sentinels in-band, optional zlib compression per data
  * section. The byte layout is re-derived (no GAMS-produced files exist
  * in this environment — SURVEY.md §0) and gated on round-trip property
  * tests (GdxCodecSpec).
  *
  * Layout:
  * {{{
  * magic "GRFTGDX1" | producer UTF | compressed byte
  * uelCount varint  | uel UTF ×N
  * symCount varint
  * per symbol:
  *   name UTF | explText UTF | typ byte | dim byte | userInfo varint
  *   domains UTF ×dim | recordCount varint | dataLen varint | data blob
  * }}}
  * Data blob (zlib-deflated when compressed=1):
  * per record: firstChanged byte, then varint keys for dims
  * firstChanged..dim-1, then values (set: varint textIndex+1 or 0;
  * parameter: 1 double; var/equ: 5 doubles). Doubles are raw IEEE bits.
  * Symbol data blobs are independently decodable given the UEL table —
  * the DSv2 scan plans one InputPartition per symbol and skips other
  * blobs via dataLen without decompressing them.
  */
object GdxCodec {

  val Magic: Array[Byte] = "GRFTGDX1".getBytes(StandardCharsets.US_ASCII)

  // ------------------------------------------------------------ varint

  private[gdx] def writeVarInt(out: DataOutputStream, value: Int): Unit = {
    var v = value
    require(v >= 0, s"varint must be non-negative: $v")
    while ((v & ~0x7f) != 0) {
      out.writeByte((v & 0x7f) | 0x80)
      v >>>= 7
    }
    out.writeByte(v)
  }

  private[gdx] def readVarInt(in: DataInputStream): Int = {
    var shift = 0
    var result = 0
    var b = in.readByte()
    while ((b & 0x80) != 0) {
      result |= (b & 0x7f) << shift
      shift += 7
      // unbounded shift would WRAP (JVM uses the low 5 bits), turning a
      // corrupt varint into a silently wrong count far from the damage
      if (shift > 28)
        throw new java.io.IOException("gdx: malformed varint (>5 bytes)")
      b = in.readByte()
    }
    // at shift==28 only bits 0-2 of the final byte fit in a
    // non-negative Int (writeVarInt encodes values >= 0 only); bit 3
    // would flip the sign and bits 4-6 shift out entirely — the same
    // silently-wrong-count failure the >5-byte guard exists for, just
    // one byte earlier
    if (shift == 28 && (b & 0x78) != 0)
      throw new java.io.IOException("gdx: malformed varint (value overflows Int)")
    result | ((b & 0x7f) << shift)
  }

  // ------------------------------------------------------------ publish

  /** Publish a fully-written temp file over `dst`, atomically where the
    * filesystem supports it. THE one publish implementation — the codec
    * writer, the streaming shard encoder, and the manifest writer all
    * route here so the fallback discipline cannot drift between copies.
    *
    * Semantics:
    *  - ATOMIC_MOVE first; readers never observe a missing/partial dst.
    *  - Fallback ONLY on CAPABILITY exceptions (AtomicMoveNotSupported,
    *    plus FileAlreadyExists/AccessDenied — ATOMIC_MOVE ignores
    *    REPLACE_EXISTING per the Files.move spec, and providers where
    *    dst exists signal it with those). A TRANSIENT IOException (EIO,
    *    a concurrent truncate having deleted the temp) propagates with
    *    dst INTACT.
    *  - The fallback is a plain REPLACE_EXISTING move — never a manual
    *    dst.delete() + rename pair, whose failure after the delete
    *    would leave NEITHER file.
    *  - If even the fallback fails, the exception names `tmp`, which is
    *    KEPT on disk: at that point it holds the only copy of the new
    *    bytes, and a caller's cleanup must not remove it (callers gate
    *    their temp-deletion on this method not having thrown).
    */
  private[graft] def publishAtomically(tmp: java.io.File, dst: java.io.File): Unit = {
    try java.nio.file.Files.move(tmp.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e @ (_: java.nio.file.AtomicMoveNotSupportedException |
                _: java.nio.file.FileAlreadyExistsException |
                _: java.nio.file.AccessDeniedException) =>
        if (!tmp.exists()) throw e
        try java.nio.file.Files.move(tmp.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        catch {
          case e2: java.io.IOException =>
            throw new java.io.IOException(
              s"gdx: cannot publish $dst — new bytes kept at $tmp", e2)
        }
    }
  }

  // ------------------------------------------------------------ write

  def write(container: GdxContainer, path: String, compress: Boolean = true): Unit = {
    // validate BEFORE any byte is produced, and write via temp + atomic
    // rename (the GdxStreamEncoder discipline): streaming straight to
    // the destination would leave a torn file over a pre-existing good
    // one if anything throws mid-write.
    container.uels.foreach { u =>
      require(u.length <= 63, s"UEL label longer than 63 chars: $u")
    }
    container.symbols.foreach { sym =>
      sym.records.foreach { r =>
        r.keys.foreach(k => require(k >= 0 && k < container.uels.size,
          s"gdx: record key index $k outside UEL table (${container.uels.size}) " +
            s"in symbol ${sym.name} — a reader would crash on label lookup"))
      }
    }
    val tmp = new java.io.File(path + s".inprogress-${java.util.UUID.randomUUID().toString.take(8)}")
    var fullyWritten = false
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16))
    try {
      out.write(Magic)
      out.writeUTF(container.producer)
      out.writeBoolean(compress)
      writeVarInt(out, container.uels.size)
      container.uels.foreach(out.writeUTF)
      writeVarInt(out, container.symbols.size)
      container.symbols.foreach { sym => writeSymbol(out, sym, compress) }
      out.close()
      fullyWritten = true
      publishAtomically(tmp, new java.io.File(path))
    } finally {
      out.close() // no-op if already closed
      // a partial temp (write-body failure) is worthless — remove it;
      // after a FAILED publish of a fully-written temp, the temp is
      // the only copy of the new bytes (publishAtomically names it in
      // the exception) — keep it. After a successful publish the move
      // consumed it and delete() is a no-op.
      if (!fullyWritten) tmp.delete()
    }
  }

  private def writeSymbol(out: DataOutputStream, sym: GdxSymbol, compress: Boolean): Unit = {
    out.writeUTF(sym.name)
    out.writeUTF(sym.explText)
    out.writeByte(sym.typ)
    out.writeByte(sym.dim)
    writeVarInt(out, sym.userInfo)
    val doms = if (sym.domains.size == sym.dim) sym.domains else Seq.fill(sym.dim)("*")
    doms.foreach(out.writeUTF)
    val sorted = sortRecords(sym.records)
    writeVarInt(out, sorted.size)
    val blob = encodeRecords(sym, sorted, compress)
    writeVarInt(out, blob.length)
    out.write(blob)
  }

  /** Record order is WRITER-DEPENDENT: GdxBuilder (this path) emits
    * UEL-index-sorted records — lexicographic by key tuple — which
    * maximizes delta-encoding wins; GdxStreamEncoder's sharded writes
    * emit arrival/label order. Readers must NOT assume index order
    * (no sorted-scan early termination): delta encoding itself is
    * order-agnostic — it only compresses better when sorted.
    */
  def sortRecords(records: Vector[GdxRecord]): Vector[GdxRecord] =
    records.sortWith { (a, b) =>
      val n = a.keys.length
      var i = 0
      while (i < n && a.keys(i) == b.keys(i)) i += 1
      i < n && a.keys(i) < b.keys(i)
    }

  private def encodeRecords(sym: GdxSymbol, sorted: Vector[GdxRecord],
      compress: Boolean): Array[Byte] = {
    val raw = new ByteArrayOutputStream()
    val d = new DataOutputStream(
      if (compress) new DeflaterOutputStream(raw, new Deflater(Deflater.BEST_SPEED)) else raw)
    // set associated texts: per-symbol text pool, referenced by index
    val textPool = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    sorted.foreach(_.text.foreach(t => textPool.getOrElseUpdate(t, textPool.size)))
    writeVarInt(d, textPool.size)
    textPool.keys.foreach(d.writeUTF)

    var prev: Array[Int] = null
    sorted.foreach { r =>
      require(r.keys.length == sym.dim, s"record dim mismatch in ${sym.name}")
      val first =
        if (prev == null) 0
        else {
          var i = 0
          while (i < sym.dim && prev(i) == r.keys(i)) i += 1
          i
        }
      d.writeByte(first)
      var i = first
      while (i < sym.dim) { writeVarInt(d, r.keys(i)); i += 1 }
      sym.typ match {
        case SymbolType.Set | SymbolType.Alias =>
          writeVarInt(d, r.text.map(textPool(_) + 1).getOrElse(0))
        case SymbolType.Parameter =>
          d.writeDouble(if (r.values.nonEmpty) r.values(0) else 0.0)
        case _ =>
          var f = 0
          while (f < 5) {
            d.writeDouble(if (f < r.values.length) r.values(f) else 0.0); f += 1
          }
      }
      prev = r.keys
    }
    d.close()
    raw.toByteArray
  }

  // ------------------------------------------------------------ read

  /** Catalog entry: symbol metadata + the byte offset/length of its data
    * blob, so scans can seek straight to one symbol.
    */
  final case class SymbolMeta(name: String, typ: Int, dim: Int, explText: String,
      userInfo: Int, domains: Seq[String], records: Int, offset: Long, dataLen: Int)

  final case class Header(producer: String, compressed: Boolean,
      uels: IndexedSeq[String], metas: Vector[SymbolMeta])

  /** Read header, UEL table and symbol metas; data blobs are skipped
    * (cheap catalog read — mirrors gdxSystemInfo/gdxSymbolInfo).
    */
  def readHeader(path: String): Header = {
    val cin = new CountingInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 16))
    val in = new DataInputStream(cin)
    try {
      val magic = new Array[Byte](Magic.length)
      in.readFully(magic)
      require(magic.sameElements(Magic), s"not a graft GDX file: $path")
      val producer = in.readUTF()
      val compressed = in.readBoolean()
      val nUels = readVarInt(in)
      val uels = Vector.fill(nUels)(in.readUTF())
      val nSyms = readVarInt(in)
      val metas = Vector.fill(nSyms) {
        val name = in.readUTF()
        val expl = in.readUTF()
        val typ = in.readByte().toInt
        val dim = in.readByte().toInt
        val userInfo = readVarInt(in)
        val domains = Seq.fill(dim)(in.readUTF())
        val nRec = readVarInt(in)
        val dataLen = readVarInt(in)
        val offset = cin.count
        var skipped = 0L
        while (skipped < dataLen) {
          val s = in.skip(dataLen - skipped)
          if (s <= 0) throw new EOFException(s"truncated data blob for $name")
          skipped += s
        }
        SymbolMeta(name, typ, dim, expl, userInfo, domains, nRec, offset, dataLen)
      }
      Header(producer, compressed, uels, metas)
    } finally in.close()
  }

  /** Decode one symbol's records given its meta (seeks to the blob).
    * Convenience eager form of [[openRecordStream]].
    */
  def readSymbolRecords(path: String, header: Header, meta: SymbolMeta): Vector[GdxRecord] = {
    val s = openRecordStream(path, header, meta)
    try s.toVector finally s.close()
  }

  /** STREAMING decode of one symbol's records: seeks to the blob and
    * inflates/decodes record-by-record — the DSv2 `PartitionReader`
    * pulls from this, so per-task read memory is O(1 record + UEL
    * table) regardless of shard size (the eager Vector form would make
    * task memory proportional to shard records).
    */
  def openRecordStream(path: String, header: Header, meta: SymbolMeta): GdxRecordStream =
    new GdxRecordStream(path, header.compressed, meta)

  final class GdxRecordStream private[GdxCodec] (path: String, compressed: Boolean,
      meta: SymbolMeta) extends Iterator[GdxRecord] with java.io.Closeable {
    private val fin = new FileInputStream(path)
    // everything after the open can throw on a truncated/corrupt shard;
    // a constructor that throws leaves the caller no handle to close,
    // so the fd must be released HERE or task retries leak one each
    private val (in, texts) =
      try {
        var toSkip = meta.offset
        while (toSkip > 0) {
          val s = fin.skip(toSkip)
          if (s <= 0) throw new EOFException(s"cannot seek to ${meta.name}")
          toSkip -= s
        }
        val bounded = new BoundedInputStream(fin, meta.dataLen)
        val din = new DataInputStream(new BufferedInputStream(
          if (compressed) new InflaterInputStream(bounded) else bounded, 1 << 16))
        (din, Vector.fill(readVarInt(din))(din.readUTF()))
      } catch {
        case e: Throwable => fin.close(); throw e
      }
    private val prev = new Array[Int](meta.dim)
    private var n = 0

    override def hasNext: Boolean = n < meta.records

    override def next(): GdxRecord = {
      val first = in.readByte().toInt
      var i = first
      while (i < meta.dim) { prev(i) = readVarInt(in); i += 1 }
      val keys = prev.clone()
      val rec = meta.typ match {
        case SymbolType.Set | SymbolType.Alias =>
          val t = readVarInt(in)
          GdxRecord(keys, Array.empty, if (t == 0) None else Some(texts(t - 1)))
        case SymbolType.Parameter =>
          GdxRecord(keys, Array(in.readDouble()))
        case _ =>
          val vs = new Array[Double](5)
          var f = 0
          while (f < 5) { vs(f) = in.readDouble(); f += 1 }
          GdxRecord(keys, vs)
      }
      n += 1
      rec
    }

    override def close(): Unit = in.close()
  }

  /** Caps reads at `limit` bytes so the inflater never crosses into the
    * next symbol's blob.
    */
  private final class BoundedInputStream(in: InputStream, limit: Long) extends InputStream {
    private var remaining = limit
    override def read(): Int =
      if (remaining <= 0) -1
      else { val r = in.read(); if (r >= 0) remaining -= 1; r }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (remaining <= 0) return -1
      val r = in.read(b, off, math.min(len.toLong, remaining).toInt)
      if (r > 0) remaining -= r
      r
    }
    override def close(): Unit = in.close()
  }

  /** Full read (all symbols). */
  def read(path: String): GdxContainer = {
    val h = readHeader(path)
    GdxContainer(h.producer, h.uels,
      h.metas.map(m => GdxSymbol(m.name, m.typ, m.dim, m.explText, m.userInfo,
        m.domains, readSymbolRecords(path, h, m))))
  }

  private final class CountingInputStream(in: InputStream) extends InputStream {
    var count: Long = 0
    override def read(): Int = {
      val r = in.read(); if (r >= 0) count += 1; r
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val r = in.read(b, off, len); if (r > 0) count += r; r
    }
    override def skip(n: Long): Long = {
      val r = in.skip(n); count += r; r
    }
    override def close(): Unit = in.close()
  }
}
