package graft.gdx

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, DeflaterOutputStream, InflaterInputStream}

/** Binary codec for the graft GDX container.
  *
  * Structural features follow the GDX data-section design (SPEC
  * GAMS-dev/gdx; SURVEY.md §1.1): per-symbol sparse coordinate lists
  * with delta-encoded keys (only the first-changed dimension onward is
  * rewritten per record), one global ordered UEL table, a file-level
  * acronym table, special-value sentinels in-band, optional zlib
  * compression per data block. The byte layout is re-derived (no
  * GAMS-produced files exist in this environment — SURVEY.md §0) and
  * gated on round-trip property tests (GdxCodecSpec).
  *
  * Layout (v3, magic "GRFTGDX3"):
  * {{{
  * magic "GRFTGDX3" | producer UTF | compressed byte
  * uelCount varint  | uel UTF ×N
  * acrCount varint  | per acronym: index varint, name UTF, text UTF
  * symCount varint
  * per symbol:
  *   name UTF | explText UTF | typ byte | dim byte | userInfo varint
  *   domains UTF ×dim | recordCount varint | dataLen varint | data section
  * }}}
  * Data section (dataLen bytes):
  * {{{
  * textPoolCount varint | text UTF ×N          (set associated texts)
  * blockCount varint
  * per block: recCount varint
  *          | per dim d: minKey_d varint, maxKey_d varint   (zone map)
  *          | blobLen varint
  * block blobs back-to-back (each independently zlib-deflated when compressed=1)
  * }}}
  * Inside a block, per record: firstChanged byte, then varint keys for
  * dims firstChanged..dim-1, then values (set: varint textIndex+1 or 0;
  * parameter: 1 double; var/equ: 5 doubles). Doubles are raw IEEE bits.
  * Delta encoding RESETS at each block boundary, so every block is
  * independently decodable — that is what buys the sparse BLOCK INDEX:
  * each block carries a PER-DIMENSION (min,max) UEL-index ZONE MAP
  * (2·dim varints — still noise next to 4096 records), and a pushed
  * label filter on ANY dimension skips whole blocks without inflating
  * them. dim_1 pruning is range-exact (writer paths emit sorted,
  * dim_1-clustered records, so a one-label slice decodes ~one block —
  * the sorted-first-dim range skip a 100 TB slice needs); dim_2+ zone
  * maps prune exactly like parquet column min/max stats — best when a
  * dim_1 run spans many blocks, never worse than no index (superset
  * pass, the per-record filter still applies). Symbol data sections
  * are independently decodable given the UEL table — the DSv2 scan
  * plans one InputPartition per symbol and skips other sections via
  * dataLen without decompressing them.
  *
  * Older files remain readable: v2 ("GRFTGDX2": block index carries
  * dim_1 (min,max) only — dims 2+ degrade to full-range) and v1
  * ("GRFTGDX1": no acronym table; one deflate stream per symbol with
  * the text pool inside, no block index). The writer always emits v3.
  */
object GdxCodec {

  val Magic: Array[Byte] = "GRFTGDX1".getBytes(StandardCharsets.US_ASCII)
  val Magic2: Array[Byte] = "GRFTGDX2".getBytes(StandardCharsets.US_ASCII)
  val Magic3: Array[Byte] = "GRFTGDX3".getBytes(StandardCharsets.US_ASCII)

  /** Byte width of one record's VALUE field(s) on the wire, per symbol
    * type: sets/aliases carry none (their text index lives with the
    * keys), parameters one IEEE double, variables/equations the 5-field
    * level/marginal/lower/upper/scale block. The single source of truth
    * for BOTH `readValuesInto` (reads width/8 doubles) and `skipValues`
    * (skips width bytes) on the lazy scan path — one definition so the
    * two can never silently desync (GdxCodecSpec pins the interleave).
    */
  def valueByteWidth(typ: Int): Int = typ match {
    case SymbolType.Set | SymbolType.Alias => 0
    case SymbolType.Parameter => 8
    case _ => 40
  }

  /** Records per data block (v2). Small enough that a block inflates in
    * L2-cache-sized chunks and a one-label slice decodes ~one block;
    * large enough that the per-block index (4 varints) is noise
    * (<0.1% of encoded size at typical ~20-60 B/record).
    */
  val DefaultBlockSize = 4096

  /** Total records decoded across all record streams in this JVM —
    * observability hook for the block-skip contract (GdxSourceSpec
    * asserts a pushed dim_1 slice decodes a strict subset). A LongAdder
    * so concurrent partition readers never contend.
    */
  private[graft] val decodedRecords = new java.util.concurrent.atomic.LongAdder

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

  def write(container: GdxContainer, path: String, compress: Boolean = true,
      blockSize: Int = DefaultBlockSize): Unit = {
    // validate BEFORE any byte is produced, and write via temp + atomic
    // rename (the GdxStreamEncoder discipline): streaming straight to
    // the destination would leave a torn file over a pre-existing good
    // one if anything throws mid-write.
    require(blockSize > 0, s"gdx: blockSize must be positive, got $blockSize")
    container.uels.foreach { u =>
      require(u.length <= 63, s"UEL label longer than 63 chars: $u")
    }
    require(container.acronyms.map(_.index).distinct.size == container.acronyms.size,
      s"gdx: duplicate acronym indices: ${container.acronyms.map(_.index).mkString(",")}")
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
      out.write(Magic3)
      out.writeUTF(container.producer)
      out.writeBoolean(compress)
      writeVarInt(out, container.uels.size)
      container.uels.foreach(out.writeUTF)
      writeAcronyms(out, container.acronyms)
      writeVarInt(out, container.symbols.size)
      container.symbols.foreach { sym => writeSymbol(out, sym, compress, blockSize) }
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

  private[gdx] def writeAcronyms(out: DataOutputStream, acrs: Seq[GdxAcronym]): Unit = {
    writeVarInt(out, acrs.size)
    acrs.foreach { a =>
      writeVarInt(out, a.index)
      out.writeUTF(a.name)
      out.writeUTF(a.text)
    }
  }

  private def writeSymbol(out: DataOutputStream, sym: GdxSymbol, compress: Boolean,
      blockSize: Int): Unit = {
    out.writeUTF(sym.name)
    out.writeUTF(sym.explText)
    out.writeByte(sym.typ)
    out.writeByte(sym.dim)
    writeVarInt(out, sym.userInfo)
    val doms = if (sym.domains.size == sym.dim) sym.domains else Seq.fill(sym.dim)("*")
    doms.foreach(out.writeUTF)
    val sorted = sortRecords(sym.records)
    writeVarInt(out, sorted.size)
    val blob = encodeRecords(sym, sorted, compress, blockSize)
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

  /** One block's index entry: record count, per-dimension UEL-index
    * zone map (mins(d)..maxs(d) — v2 files carry dim_1 only, the rest
    * degrade to full range), and the (possibly deflated) blob length
    * in bytes.
    */
  private[gdx] final case class BlockMeta(recCount: Int, mins: Vector[Int],
      maxs: Vector[Int], len: Int)

  /** Shared per-record block encoder: delta-encodes records into
    * independently-deflated fixed-record-count blocks, tracking each
    * block's first-dim key range. ONE implementation for the eager
    * writer and the streaming shard encoder, so the two paths stay
    * byte-identical for identically-ordered input (GdxStreamEncoderSpec
    * pins this). The caller owns the text pool (pool ids arrive here
    * pre-resolved) and writes the section header; this class only emits
    * block blobs to `sink` and returns their index.
    */
  private[gdx] final class BlockWriter(typ: Int, dim: Int, compress: Boolean,
      blockSize: Int, sink: java.io.OutputStream) {
    require(blockSize > 0, s"gdx: blockSize must be positive, got $blockSize")
    private val metas = Vector.newBuilder[BlockMeta]
    private val curBuf = new ByteArrayOutputStream()
    private val cur = new DataOutputStream(curBuf)
    private var prev: Array[Int] = null
    private var count = 0
    // per-dim zone map of the in-flight block
    private val minD = Array.fill(math.max(dim, 1))(Int.MaxValue)
    private val maxD = Array.fill(math.max(dim, 1))(-1)

    /** `textCode` = pool index + 1, or 0 for no text (sets only). */
    def add(keys: Array[Int], values: Array[Double], textCode: Int): Unit = {
      require(keys.length == dim, s"record arity ${keys.length} != dim $dim")
      val first =
        if (prev == null) 0
        else {
          var i = 0
          while (i < dim && prev(i) == keys(i)) i += 1
          i
        }
      cur.writeByte(first)
      var i = first
      while (i < dim) { writeVarInt(cur, keys(i)); i += 1 }
      typ match {
        case SymbolType.Set | SymbolType.Alias =>
          writeVarInt(cur, textCode)
        case SymbolType.Parameter =>
          cur.writeDouble(if (values.nonEmpty) values(0) else 0.0)
        case _ =>
          var f = 0
          while (f < 5) {
            cur.writeDouble(if (f < values.length) values(f) else 0.0); f += 1
          }
      }
      prev = keys
      var d = 0
      while (d < dim) {
        if (keys(d) < minD(d)) minD(d) = keys(d)
        if (keys(d) > maxD(d)) maxD(d) = keys(d)
        d += 1
      }
      count += 1
      if (count == blockSize) flushBlock()
    }

    private def flushBlock(): Unit = if (count > 0) {
      cur.flush()
      val rawBytes = curBuf.toByteArray
      val outBytes =
        if (compress) {
          val bos = new ByteArrayOutputStream(rawBytes.length / 2 + 16)
          // end() explicitly: DeflaterOutputStream.close() does NOT end
          // a caller-supplied Deflater, and per-block native zlib
          // buffers would otherwise live until finalization — the
          // writer-side twin of the reader's per-block inflater.end()
          val defl = new Deflater(Deflater.BEST_SPEED)
          try {
            val ds = new DeflaterOutputStream(bos, defl)
            ds.write(rawBytes)
            ds.close()
          } finally defl.end()
          bos.toByteArray
        } else rawBytes
      sink.write(outBytes)
      metas += BlockMeta(count,
        Vector.tabulate(dim)(minD(_)), Vector.tabulate(dim)(maxD(_)),
        outBytes.length)
      curBuf.reset()
      // delta reset: every block decodes independently (the skip contract)
      prev = null
      count = 0
      java.util.Arrays.fill(minD, Int.MaxValue)
      java.util.Arrays.fill(maxD, -1)
    }

    /** Flush the trailing partial block and return the block index. */
    def finish(): Vector[BlockMeta] = { flushBlock(); metas.result() }
  }

  /** Serialize a v3 data-section header (text pool + block index with
    * per-dim zone maps).
    */
  private[gdx] def writeSectionHeader(d: DataOutputStream,
      texts: Iterable[String], metas: Seq[BlockMeta]): Unit = {
    writeVarInt(d, texts.size)
    texts.foreach(d.writeUTF)
    writeVarInt(d, metas.size)
    metas.foreach { m =>
      writeVarInt(d, m.recCount)
      var i = 0
      while (i < m.mins.length) {
        writeVarInt(d, m.mins(i))
        writeVarInt(d, m.maxs(i))
        i += 1
      }
      writeVarInt(d, m.len)
    }
  }

  private def encodeRecords(sym: GdxSymbol, sorted: Vector[GdxRecord],
      compress: Boolean, blockSize: Int): Array[Byte] = {
    // set associated texts: per-symbol text pool, referenced by index
    val textPool = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    sorted.foreach(_.text.foreach(t => textPool.getOrElseUpdate(t, textPool.size)))
    val blocksBuf = new ByteArrayOutputStream()
    val bw = new BlockWriter(sym.typ, sym.dim, compress, blockSize, blocksBuf)
    sorted.foreach { r =>
      require(r.keys.length == sym.dim, s"record dim mismatch in ${sym.name}")
      bw.add(r.keys, r.values, r.text.map(textPool(_) + 1).getOrElse(0))
    }
    val metas = bw.finish()
    val raw = new ByteArrayOutputStream()
    val d = new DataOutputStream(raw)
    writeSectionHeader(d, textPool.keys, metas)
    d.flush()
    blocksBuf.writeTo(raw)
    raw.toByteArray
  }

  // ------------------------------------------------------------ read

  /** Catalog entry: symbol metadata + the byte offset/length of its data
    * blob, so scans can seek straight to one symbol.
    */
  final case class SymbolMeta(name: String, typ: Int, dim: Int, explText: String,
      userInfo: Int, domains: Seq[String], records: Int, offset: Long, dataLen: Int)

  final case class Header(producer: String, compressed: Boolean,
      uels: IndexedSeq[String], metas: Vector[SymbolMeta],
      version: Int = 2, acronyms: Vector[GdxAcronym] = Vector.empty)

  /** Read header, UEL table, acronym table and symbol metas; data blobs
    * are skipped (cheap catalog read — mirrors
    * gdxSystemInfo/gdxSymbolInfo/gdxAcronymGetInfo).
    */
  def readHeader(path: String): Header = {
    val cin = new CountingInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 16))
    val in = new DataInputStream(cin)
    try {
      val magic = new Array[Byte](Magic.length)
      in.readFully(magic)
      val version =
        if (magic.sameElements(Magic3)) 3
        else if (magic.sameElements(Magic2)) 2
        else if (magic.sameElements(Magic)) 1
        else throw new IllegalArgumentException(s"not a graft GDX file: $path")
      val producer = in.readUTF()
      val compressed = in.readBoolean()
      val nUels = readVarInt(in)
      val uels = Vector.fill(nUels)(in.readUTF())
      val acronyms =
        if (version >= 2)
          Vector.fill(readVarInt(in))(GdxAcronym(readVarInt(in), in.readUTF(), in.readUTF()))
        else Vector.empty
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
      Header(producer, compressed, uels, metas, version, acronyms)
    } finally in.close()
  }

  /** Decode one symbol's records given its meta (seeks to the blob).
    * Convenience eager form of [[openRecordStream]].
    */
  def readSymbolRecords(path: String, header: Header, meta: SymbolMeta): Vector[GdxRecord] = {
    val s = openRecordStream(path, header, meta)
    try s.toVector finally s.close()
  }

  /** STREAMING decode of one symbol's records: seeks to the section and
    * inflates/decodes record-by-record — the DSv2 `PartitionReader`
    * pulls from this, so per-task read memory is O(1 record + UEL
    * table + block index) regardless of shard size (the eager Vector
    * form would make task memory proportional to shard records).
    *
    * `dimAllowed`: admissible UEL indices per dimension (0-based) from
    * pushed label filters. Blocks whose zone map excludes every allowed
    * index on ANY filtered dimension are SKIPPED WITHOUT INFLATING —
    * dim_1 range-exactly (writer paths emit dim_1-clustered records, so
    * a one-label slice decodes ~one block out of records/4096), dims 2+
    * via the v3 per-dim zone map (parquet-stats-style pruning). A
    * SUPERSET pass: the per-record filter (reader `keep`) still applies.
    * v2 files prune on dim_1 only; v1 files decode fully (no index) —
    * the filter stays correct via the reader's per-record check.
    */
  def openRecordStream(path: String, header: Header, meta: SymbolMeta,
      dimAllowed: Map[Int, Set[Int]] = Map.empty): GdxRecordStream =
    new GdxRecordStream(path, header.compressed, header.version, meta, dimAllowed)

  final class GdxRecordStream private[GdxCodec] (path: String, compressed: Boolean,
      version: Int, meta: SymbolMeta, dimAllowed: Map[Int, Set[Int]])
      extends Iterator[GdxRecord] with java.io.Closeable {
    private val fin = new FileInputStream(path)
    /** Records this stream actually decoded (observability: block skip). */
    var decoded: Long = 0L
    // everything after the open can throw on a truncated/corrupt shard;
    // a constructor that throws leaves the caller no handle to close,
    // so the fd must be released HERE or task retries leak one each
    private val (base, texts, blocks) =
      try {
        var toSkip = meta.offset
        while (toSkip > 0) {
          val s = fin.skip(toSkip)
          if (s <= 0) throw new EOFException(s"cannot seek to ${meta.name}")
          toSkip -= s
        }
        val bounded = new BoundedInputStream(fin, meta.dataLen)
        if (version >= 2) {
          // v2/v3: uncompressed section header (text pool + block
          // index), then independently-deflated block blobs
          val din = new DataInputStream(new BufferedInputStream(bounded, 1 << 16))
          val ts = Vector.fill(readVarInt(din))(din.readUTF())
          val bs = Vector.fill(readVarInt(din)) {
            val rc = readVarInt(din)
            if (version >= 3) {
              // per-dim zone map
              val mins = new Array[Int](meta.dim)
              val maxs = new Array[Int](meta.dim)
              var i = 0
              while (i < meta.dim) {
                mins(i) = readVarInt(din); maxs(i) = readVarInt(din); i += 1
              }
              BlockMeta(rc, mins.toVector, maxs.toVector, readVarInt(din))
            } else {
              // v2 carries dim_1 only; dims 2+ degrade to full range
              val (lo, hi) = (readVarInt(din), readVarInt(din))
              val mins = Vector.tabulate(meta.dim)(i => if (i == 0) lo else 0)
              val maxs = Vector.tabulate(meta.dim)(i =>
                if (i == 0) hi else Int.MaxValue)
              BlockMeta(rc, mins, maxs, readVarInt(din))
            }
          }
          (din, ts, bs)
        } else {
          // v1: one deflate stream for the whole symbol, pool inside
          val din = new DataInputStream(new BufferedInputStream(
            if (compressed) new InflaterInputStream(bounded) else bounded, 1 << 16))
          val ts = Vector.fill(readVarInt(din))(din.readUTF())
          (din, ts, Vector(BlockMeta(meta.records,
            Vector.fill(meta.dim)(0), Vector.fill(meta.dim)(Int.MaxValue), -1)))
        }
      } catch {
        case e: Throwable => fin.close(); throw e
      }
    private val prev = new Array[Int](meta.dim)
    private var blockIdx = 0
    private var remaining = 0
    // v1: the section-level stream IS the record stream; v2: per-block
    private var in: DataInputStream = if (version >= 2) null else base
    private var blockBound: BoundedInputStream = null
    // per-block inflaters are ended EXPLICITLY (closing the
    // InflaterInputStream would cascade-close the shared base stream);
    // without end() each block leaks native zlib memory until GC
    private var blockInflater: java.util.zip.Inflater = null
    if (version < 2) remaining = meta.records

    private def blockMatches(b: BlockMeta): Boolean =
      dimAllowed.forall { case (d, allowed) =>
        // small allowed sets (pushed labels) → iterate the set, not the
        // range; a dim past this symbol's arity never filters
        d >= meta.dim ||
          allowed.exists(k => k >= b.mins(d) && k <= b.maxs(d))
      }

    /** Position `in` inside a block with records left; false when the
      * section is exhausted. v2 only (v1 never calls: remaining covers
      * the whole symbol).
      */
    private def ensureBlock(): Boolean = {
      while (remaining == 0 && blockIdx < blocks.length) {
        if (blockBound != null) {
          // drain to the block boundary: the inflater may finish without
          // consuming trailing buffered bytes of its bound
          var r = blockBound.skip(Long.MaxValue)
          while (r > 0) r = blockBound.skip(Long.MaxValue)
          blockBound = null
        }
        if (blockInflater != null) { blockInflater.end(); blockInflater = null }
        val b = blocks(blockIdx)
        blockIdx += 1
        if (!blockMatches(b)) {
          var toSkip = b.len.toLong
          while (toSkip > 0) {
            val s = base.skip(toSkip)
            if (s <= 0) throw new EOFException(s"truncated block in ${meta.name}")
            toSkip -= s
          }
        } else {
          blockBound = new BoundedInputStream(base, b.len)
          // the buffered layer sits on the UNCOMPRESSED side: varint/
          // byte reads otherwise call Inflater.inflate once per byte
          // (r14 probe: a large share of decode time). The compressed
          // boundary stays exact — blockBound caps the inflater.
          in = new DataInputStream(new BufferedInputStream(
            if (compressed) {
              blockInflater = new java.util.zip.Inflater()
              new InflaterInputStream(blockBound, blockInflater)
            } else blockBound, 1 << 15))
          java.util.Arrays.fill(prev, 0) // delta resets per block
          remaining = b.recCount
        }
      }
      remaining > 0
    }

    override def hasNext: Boolean = remaining > 0 || (version >= 2 && ensureBlock())

    /** Decode the next record into CALLER-OWNED arrays — the flyweight
      * path the columnar reader rides (r14): no per-record GdxRecord /
      * keys / values allocation. `values` must hold ≥ the symbol's
      * value arity (0/1/5; values(0) is zeroed for sets so the
      * special-value flag columns read 0.0, matching [[next]]'s
      * empty-values semantics). Returns the 1-based text-pool index
      * (0 = no text) — resolve via [[textAt]].
      */
    def nextInto(keys: Array[Int], values: Array[Double]): Int = {
      val t = nextKeysInto(keys)
      readValuesInto(values)
      t
    }

    /** Keys-only decode — the LAZY half of the flyweight path (r15):
      * delta keys + set-text index only; the value field(s) stay
      * unparsed in the stream until the caller decides the record
      * survives its residual filter ([[readValuesInto]]) or not
      * ([[skipValues]]). On selective scans most records die on their
      * keys, and 8–40 bytes of double assembly per corpse is the
      * dominant avoidable cost once blocks already match the zone map.
      * Every call MUST be paired with exactly one of the two value
      * calls before the next record.
      */
    def nextKeysInto(keys: Array[Int]): Int = {
      if (version >= 2 && remaining == 0 && !ensureBlock())
        throw new NoSuchElementException(s"gdx: past end of ${meta.name}")
      val first = in.readByte().toInt
      var i = first
      while (i < meta.dim) { prev(i) = readVarInt(in); i += 1 }
      System.arraycopy(prev, 0, keys, 0, meta.dim)
      var t = 0
      meta.typ match {
        case SymbolType.Set | SymbolType.Alias => t = readVarInt(in)
        case _ => ()
      }
      remaining -= 1
      decoded += 1
      decodedRecords.increment()
      t
    }

    /** Parse the current record's value field(s) (pairs with
      * [[nextKeysInto]]). Sets zero values(0) so the special-value flag
      * columns read 0.0 — [[next]]'s empty-values semantics. Reads
      * exactly [[GdxCodec.valueByteWidth]](typ) bytes — the SAME
      * single source of truth [[skipValues]] skips, so the lazy scan
      * path cannot desync if the value encoding ever changes.
      */
    def readValuesInto(values: Array[Double]): Unit = {
      val n = GdxCodec.valueByteWidth(meta.typ) >> 3
      if (n == 0) { if (values.length > 0) values(0) = 0.0 }
      else {
        var f = 0
        while (f < n) { values(f) = in.readDouble(); f += 1 }
      }
    }

    /** Skip the current record's value bytes without assembling them
      * (pairs with [[nextKeysInto]] when the residual filter killed the
      * record). Width comes from [[GdxCodec.valueByteWidth]] — shared
      * with [[readValuesInto]] by construction.
      */
    def skipValues(): Unit = {
      var left = GdxCodec.valueByteWidth(meta.typ)
      while (left > 0) {
        val s = in.skipBytes(left)
        if (s <= 0) throw new EOFException(s"truncated record in ${meta.name}")
        left -= s
      }
    }

    def textAt(t: Int): String = texts(t - 1)

    private val scratchVals = new Array[Double](5)

    override def next(): GdxRecord = {
      val keys = new Array[Int](meta.dim)
      val t = nextInto(keys, scratchVals)
      meta.typ match {
        case SymbolType.Set | SymbolType.Alias =>
          GdxRecord(keys, Array.empty, if (t == 0) None else Some(texts(t - 1)))
        case SymbolType.Parameter =>
          GdxRecord(keys, Array(scratchVals(0)))
        case _ =>
          GdxRecord(keys, java.util.Arrays.copyOf(scratchVals, 5))
      }
    }

    override def close(): Unit = {
      if (blockInflater != null) { blockInflater.end(); blockInflater = null }
      base.close()
      fin.close()
    }
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
    override def skip(n: Long): Long = {
      if (remaining <= 0 || n <= 0) return 0
      val r = in.skip(math.min(n, remaining))
      if (r > 0) remaining -= r
      r
    }
    override def close(): Unit = in.close()
  }

  /** Full read (all symbols + acronym table). */
  def read(path: String): GdxContainer = {
    val h = readHeader(path)
    GdxContainer(h.producer, h.uels,
      h.metas.map(m => GdxSymbol(m.name, m.typ, m.dim, m.explText, m.userInfo,
        m.domains, readSymbolRecords(path, h, m))),
      h.acronyms)
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
