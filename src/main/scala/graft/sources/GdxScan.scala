package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{GeneralScalarExpression, Literal, NamedReference, Expression => V2Expr}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.gdx._

/** The connector-internal form of a pushed label predicate: dim ordinal
  * (0-based) plus the admissible labels, lowercased. The decoder matches
  * case-insensitively — a SUPERSET of what any of the accepted source
  * predicates admits (exact `=`/`IN` or the `lower(dim_i) = lit` shape
  * gdxpy-style case-insensitive filters lower to) — and every predicate
  * is also returned to Spark as a residual, so post-scan evaluation
  * restores the exact semantics either way.
  */
case class DimLabelFilter(dim: Int, labels: Set[String]) {
  override def toString: String =
    s"dim_${dim + 1} IN {${labels.toSeq.sorted.mkString(",")}}"
}

/** Scan with column pruning (gdx_scan_fields: only requested value
  * fields are materialized) and dim-label filter pushdown
  * (filter_label_eq: `=`/`IN` on dim columns — plain or wrapped in
  * LOWER(), the case-insensitive gdxpy filt shape — is applied on UEL
  * indices inside the decoder, before any row is built; label→index
  * lookup happens once per partition against the shard's UEL table).
  * V2 predicates rather than v1 Filters precisely so the LOWER() form
  * pushes: v1 translation only carries bare-attribute comparisons.
  */
class GdxScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownV2Filters {

  private var required: StructType = fullSchema
  private var pushed: Array[Predicate] = Array.empty
  private var dimFilters: Seq[DimLabelFilter] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep full-schema field order for decode simplicity
    val names = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => names.contains(f.name)))
  }

  // dim_i reference, bare or LOWER-wrapped (both admit the same
  // superset under the decoder's case-insensitive match)
  private def dimOf(e: V2Expr): Option[Int] = e match {
    case f: NamedReference if f.fieldNames.length == 1 &&
        f.fieldNames()(0).matches("dim_[0-9]+") =>
      Some(f.fieldNames()(0).stripPrefix("dim_").toInt - 1)
    case g: GeneralScalarExpression if g.name == "LOWER" && g.children.length == 1 =>
      dimOf(g.children()(0))
    case _ => None
  }

  private def strOf(e: V2Expr): Option[String] = e match {
    case l: Literal[_] if l.dataType.isInstanceOf[StringType] && l.value != null =>
      Some(l.value.toString)
    case _ => None
  }

  private def translate(p: Predicate): Option[DimLabelFilter] = p.name() match {
    case "=" => p.children() match {
      case Array(a, b) =>
        (for { d <- dimOf(a); s <- strOf(b) } yield DimLabelFilter(d, Set(s.toLowerCase(java.util.Locale.ROOT))))
          .orElse(for { d <- dimOf(b); s <- strOf(a) } yield DimLabelFilter(d, Set(s.toLowerCase(java.util.Locale.ROOT))))
      case _ => None
    }
    case "IN" =>
      val cs = p.children()
      for {
        d <- cs.headOption.flatMap(dimOf)
        vs = cs.drop(1).map(strOf) if vs.forall(_.isDefined)
      } yield DimLabelFilter(d, vs.flatten.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
    case _ => None
  }

  override def pushPredicates(predicates: Array[Predicate]): Array[Predicate] = {
    val accepted = predicates.flatMap(p => translate(p).map(p -> _))
    pushed = accepted.map(_._1)
    dimFilters = accepted.map(_._2).toSeq
    predicates // all residual: the decoder match is a superset, Spark re-checks exactly
  }

  override def pushedPredicates(): Array[Predicate] = pushed

  override def build(): Scan = new GdxScan(fullSchema, required, dimFilters, options)
}

class GdxScan(fullSchema: StructType, required: StructType, pushed: Seq[DimLabelFilter],
    options: CaseInsensitiveStringMap) extends Scan with Batch {

  private val path = GdxTable.localPath(options.get("path"))
  private val symbol = Option(options.get("symbol")).getOrElse("")
  // re-validated HERE, not only in schemaFor: a user-supplied schema
  // (supportsExternalMetadata) skips schema inference entirely, and a
  // typo'd mode ("RAW") would otherwise silently degrade to lossy map
  // semantics — sentinel-destroying, exactly what the guard exists for
  locally {
    val sv = options.getOrDefault("specialValues", "map")
    require(sv == "map" || sv == "columns" || sv == "raw",
      s"gdx: specialValues must be map|columns|raw (case-sensitive), got '$sv'")
  }

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GdxMicroBatchStream(path, symbol, fullSchema, required, pushed,
      raw = options.getOrDefault("specialValues", "map") == "raw",
      committedOnly = options.getBoolean("committedOnly", false))

  override def planInputPartitions(): Array[InputPartition] = {
    // batch membership honors the manifest (exactly-once vs in-flight
    // streaming epochs); un-manifested dirs fall back to listing
    val shards = GdxTable.committedShardsOf(path)
    if (symbol == GdxTable.CatalogSymbol)
      Array(GdxCatalogPartition(shards))
    else if (symbol == GdxTable.UelSymbol)
      Array(GdxUelPartition(shards))
    else if (symbol == GdxTable.AcronymSymbol)
      Array(GdxAcronymPartition(shards))
    else {
      // empty symbol means "the dataset's first symbol" — resolve the
      // NAME once at plan time (from the same first shard schemaFor
      // used) so a multi-shard scan cannot silently union each shard's
      // OWN first symbol; a shard genuinely lacking the resolved name
      // then errors loudly in its reader instead of mixing rows
      val resolved =
        if (symbol.nonEmpty) symbol
        else shards.headOption.map { s0 =>
          GdxTable.resolveSymbol(GdxCodec.readHeader(s0), "", s0).name
        }.getOrElse(symbol)
      prunedByManifest(shards).map(s => GdxInputPartition(s, resolved)).toArray
    }
  }

  /** Driver-side shard pruning: pushed dim_1 equality/IN labels are
    * checked against the manifest's per-shard [lo, hi] label ranges —
    * with the clustered write layout a label lives in exactly one shard,
    * so a label-equality scan plans ONE InputPartition out of O(10⁵)
    * without opening a single shard header. Shards lacking range info
    * are always kept.
    */
  private def prunedByManifest(shards: Seq[String]): Seq[String] = {
    val labels: Set[String] = pushed.collect {
      case DimLabelFilter(0, ls) => ls
    }.foldLeft(Option.empty[Set[String]]) {
      // multiple pushed filters on dim_1 → intersection semantics
      case (None, s) => Some(s)
      case (Some(acc), s) => Some(acc.intersect(s))
    }.getOrElse(return shards)
    // Range pruning is exact only when default-locale lowercasing
    // coincides with Locale.ROOT lowercasing for every string: the
    // decoder's uelIndex deliberately unions BOTH lowercases (see the
    // GdxSymbolReader.uelIndex comment), while the manifest records
    // only ROOT-lowercased [lo, hi] — so under a divergent locale a
    // pushed label can match a shard whose ROOT-range excludes it
    // (tr: pushed dotless 'ıstanbul' vs stored "istanbul"), and
    // pruning that shard loses its rows with no residual to catch it.
    // java.lang.ConditionalSpecialCasing diverges from ROOT only for
    // tr/az/lt, so everywhere else the test below is exact; on those
    // three, skip pruning — correctness over the optimization.
    // (Assumes driver and executors share a locale, the standard Spark
    // deployment; the decoder itself is locale-robust either way.)
    val lang = java.util.Locale.getDefault.getLanguage
    if (lang == "tr" || lang == "az" || lang == "lt") return shards
    val ranges = GdxTable.shardRangesOf(path)
    if (ranges.isEmpty) return shards
    shards.filter { s =>
      ranges.get(new java.io.File(s).getName) match {
        case Some((lo, hi)) => labels.exists(l => l >= lo && l <= hi)
        case None => true
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GdxReaderFactory(fullSchema, required, pushed, symbol,
      raw = options.getOrDefault("specialValues", "map") == "raw",
      // vectorized by default; option("vectorized","false") keeps the
      // row path reachable (debug/bisect escape hatch, and the A/B
      // handle the SCALE.md throughput numbers were measured with)
      vectorized = options.getBoolean("vectorized", true))

  override def description(): String =
    s"GdxScan(path=$path, symbol=$symbol, pushed=${pushed.mkString(",")})"
}

case class GdxInputPartition(shardPath: String, symbol: String) extends InputPartition
case class GdxCatalogPartition(shardPaths: Seq[String]) extends InputPartition
case class GdxUelPartition(shardPaths: Seq[String]) extends InputPartition
case class GdxAcronymPartition(shardPaths: Seq[String]) extends InputPartition

class GdxReaderFactory(fullSchema: StructType, required: StructType,
    pushed: Seq[DimLabelFilter], symbol: String,
    raw: Boolean = false, vectorized: Boolean = true)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case GdxCatalogPartition(shards) => new GdxCatalogReader(shards, required)
      case GdxUelPartition(shards) => new GdxUelReader(shards, required)
      case GdxAcronymPartition(shards) => new GdxAcronymReader(shards, required)
      case GdxInputPartition(shard, sym) =>
        new GdxSymbolReader(shard, sym, fullSchema, required, pushed, raw)
    }

  // vectorized path for symbol record scans (the data-sized reads —
  // catalog/UEL/acronym views are header-sized and stay row-based):
  // every symbol column type has an OnHeapColumnVector filler, so the
  // decision is unconditional per partition type
  override def supportColumnarReads(partition: InputPartition): Boolean =
    vectorized && partition.isInstanceOf[GdxInputPartition]

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    partition match {
      case GdxInputPartition(shard, sym) =>
        new GdxSymbolColumnarReader(shard, sym, required, pushed, raw)
      case other => throw new IllegalStateException(
        s"columnar read requested for non-symbol partition $other")
    }
}

/** Emits one row per symbol — the gdx_catalog view. On a sharded
  * directory the metas of ALL shards are merged (record counts summed
  * per symbol name) so the catalog reflects the whole dataset, not one
  * shard; header-only reads, no record blobs touched.
  */
class GdxCatalogReader(paths: Seq[String], required: StructType)
    extends PartitionReader[InternalRow] {
  // merged record count carried as a separate Long: per-shard counts are
  // Int, but across O(10^5) shards a symbol's total overflows Int
  private val metas: Iterator[(GdxCodec.SymbolMeta, Long)] = {
    val all = paths.flatMap(p => GdxCodec.readHeader(p).metas)
    all.groupBy(_.name.toLowerCase(java.util.Locale.ROOT)).values.map { ms =>
      (ms.head, ms.map(_.records.toLong).sum)
    }.toSeq.sortBy(_._1.name).iterator
  }
  private var cur: (GdxCodec.SymbolMeta, Long) = _

  // honor column pruning: emit exactly the required fields, in order
  private val emitters: Array[((GdxCodec.SymbolMeta, Long)) => Any] =
    required.fieldNames.map[((GdxCodec.SymbolMeta, Long)) => Any] {
      case "name" => m => UTF8String.fromString(m._1.name)
      case "type" => m => UTF8String.fromString(SymbolType.names.getOrElse(m._1.typ, "unknown"))
      case "dim" => m => m._1.dim
      // variable/equation subtype (GMS_VARTYPE/GMS_EQUTYPE class) —
      // rides the codec's userInfo slot, 0 for sets/parameters
      case "subtype" => m => m._1.userInfo
      case "records" => m => m._2
      case "expl_text" => m => UTF8String.fromString(m._1.explText)
      case "domains" => m => UTF8String.fromString(m._1.domains.mkString(","))
      case other => throw new IllegalArgumentException(s"unknown catalog field $other")
    }

  override def next(): Boolean = { val h = metas.hasNext; if (h) cur = metas.next(); h }

  override def get(): InternalRow =
    new GenericInternalRow(emitters.map(e => e(cur)).toArray[Any])

  override def close(): Unit = ()
}

/** Emits the UEL (label) dictionary — gdxpy's gdxGetUEL loop view:
  * one (uel_index, label) row per registered label. Single file: the
  * file's own table in registration order. Sharded dataset: shards are
  * merged in sorted path order with case-insensitive first-appearance
  * dedup and a fresh 1-based index (per-shard indices are local to
  * each shard's table, so a global view must re-number). Header-only
  * reads — UEL tables live in the header, no record blobs touched.
  */
class GdxUelReader(paths: Seq[String], required: StructType)
    extends PartitionReader[InternalRow] {
  private val labels: Iterator[(Int, String)] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    val out = Vector.newBuilder[String]
    paths.sorted.foreach { p =>
      GdxCodec.readHeader(p).uels.foreach { u =>
        if (seen.add(u.toLowerCase(java.util.Locale.ROOT))) out += u
      }
    }
    out.result().zipWithIndex.map { case (u, i) => (i + 1, u) }.iterator
  }
  private var cur: (Int, String) = _

  private val emitters: Array[((Int, String)) => Any] =
    required.fieldNames.map[((Int, String)) => Any] {
      case "uel_index" => u => u._1
      case "label" => u => UTF8String.fromString(u._2)
      case other => throw new IllegalArgumentException(s"unknown uel field $other")
    }

  override def next(): Boolean = { val h = labels.hasNext; if (h) cur = labels.next(); h }

  override def get(): InternalRow =
    new GenericInternalRow(emitters.map(e => e(cur)).toArray[Any])

  override def close(): Unit = ()
}

/** Emits the acronym table (gdxAcronymCount/gdxAcronymGetInfo view):
  * one (acr_index, name, text) row per registered acronym. Sharded
  * datasets merge by index; a shard registering a DIFFERENT name
  * (case-insensitively — GAMS identifier semantics) under an
  * already-seen index fails loudly — the EXACT contract
  * [[graft.gdx.Gdx.merge]] enforces, so a hand-assembled dir is
  * readable through this view iff it is mergeable: names compare
  * case-insensitively, explanatory TEXT differences are tolerated
  * with first-shard-wins (paths iterate sorted, so the pick is
  * deterministic). A silent first-wins on the NAME would rename
  * sentinel values; the sharded writer stamps every shard with the
  * same table, so legitimate data never trips this. Header-only
  * reads, no record blobs touched.
  */
class GdxAcronymReader(paths: Seq[String], required: StructType)
    extends PartitionReader[InternalRow] {
  private val acrs: Iterator[graft.gdx.GdxAcronym] = {
    val seen = scala.collection.mutable.HashMap.empty[Int, graft.gdx.GdxAcronym]
    paths.sorted.foreach { p =>
      GdxCodec.readHeader(p).acronyms.foreach { a =>
        seen.get(a.index) match {
          case None => seen(a.index) = a
          case Some(prev) =>
            if (!prev.name.equalsIgnoreCase(a.name))
              throw new IllegalArgumentException(
                s"gdx: acronym index ${a.index} disagrees across shards: " +
                  s"(${prev.name}) vs (${a.name}) in $p")
        }
      }
    }
    seen.values.toVector.sortBy(_.index).iterator
  }
  private var cur: graft.gdx.GdxAcronym = _

  private val emitters: Array[graft.gdx.GdxAcronym => Any] =
    required.fieldNames.map[graft.gdx.GdxAcronym => Any] {
      case "acr_index" => a => a.index
      case "name" => a => UTF8String.fromString(a.name)
      case "text" => a => UTF8String.fromString(a.text)
      case other => throw new IllegalArgumentException(s"unknown acronym field $other")
    }

  override def next(): Boolean = { val h = acrs.hasNext; if (h) cur = acrs.next(); h }

  override def get(): InternalRow =
    new GenericInternalRow(emitters.map(e => e(cur)).toArray[Any])

  override def close(): Unit = ()
}

/** Shared symbol-decode core behind BOTH reader shapes (row-at-a-time
  * [[GdxSymbolReader]] and vectorized [[GdxSymbolColumnarReader]]):
  * header + UEL index resolution, pushed-filter translation, the
  * block-skipping record stream, and the residual per-record check —
  * one implementation, so the two paths can never drift on pruning or
  * filter semantics.
  */
private[sources] final class GdxSymbolDecode(path: String, symbol: String,
    pushed: Seq[DimLabelFilter], raw: Boolean) {

  val header = GdxCodec.readHeader(path)
  val meta = GdxTable.resolveSymbol(header, symbol, path)

  // label filters → UEL index predicates, resolved once here. A label
  // absent from this shard's UEL table matches nothing. Multiple pushed
  // filters on the same dim (`=` + `IN`) intersect — matching
  // prunedByManifest's semantics — rather than last-wins.
  private val dimFilters: Map[Int, Set[Int]] =
    pushed.groupBy(_.dim).map { case (i, fs) =>
      i -> fs.map(_.labels.flatMap(lookup)).reduce(_ intersect _)
    }
  // O(1) per pushed label: one lowercased index map per reader. Every
  // case-duplicate index is kept: the codec does not forbid a UEL
  // table carrying both 'Foo' and 'FOO' (only the builders dedup), and
  // a first-occurrence-wins map would make the pushed filter match a
  // SUBSET of the case-insensitive predicate — rows silently dropped
  // that the residual re-check could never restore (it only sees rows
  // the decoder emitted).
  // ... and BOTH the Locale.ROOT and default-locale lowercases of each
  // label are indexed when they differ (tr/az JVMs: dotted/dotless I):
  // Spark's lower() takes the default-locale path for non-ASCII
  // strings, so a ROOT-only index could make the pushed filter match a
  // SUBSET of what the engine-evaluated predicate matches — the same
  // silent row loss, via locale instead of case-duplicates. Indexing
  // the union keeps the decoder a strict superset under any locale;
  // the residual re-check stays exact.
  private lazy val uelIndex: Map[String, Array[Int]] = {
    val m = new scala.collection.mutable.HashMap[
      String, scala.collection.mutable.ArrayBuffer[Int]]()
    def add(k: String, i: Int): Unit =
      m.getOrElseUpdate(k, new scala.collection.mutable.ArrayBuffer[Int]) += i
    var i = 0
    while (i < header.uels.length) {
      val root = header.uels(i).toLowerCase(java.util.Locale.ROOT)
      val dflt = header.uels(i).toLowerCase
      add(root, i)
      if (dflt != root) add(dflt, i)
      i += 1
    }
    m.view.mapValues(_.toArray.distinct).toMap
  }
  private def lookup(label: String): Array[Int] = {
    val root = uelIndex.getOrElse(label.toLowerCase(java.util.Locale.ROOT), Array.empty[Int])
    val dl = label.toLowerCase
    if (dl == label.toLowerCase(java.util.Locale.ROOT)) root
    else (root ++ uelIndex.getOrElse(dl, Array.empty[Int])).distinct
  }

  // shard skip: a pushed label absent from this shard's UEL table can
  // match nothing here — with the clustered write layout each label
  // lives in exactly one shard, so every other shard skips its record
  // blob entirely (header-only read).
  private val shardCanMatch = dimFilters.valuesIterator.forall(_.nonEmpty)

  // streaming decode: records inflate one at a time — task memory is
  // O(UEL table + block index), never O(shard records). ALL pushed
  // per-dim index sets ride into the stream, where the block zone maps
  // skip non-matching blocks WITHOUT inflating them (dim_1
  // range-exactly on sorted layouts — a one-label slice decodes ~one
  // block; dims 2+ parquet-stats-style on v3 files); `keep` below
  // still re-checks per record, so the skip is a pure superset pass.
  private val stream: GdxCodec.GdxRecordStream =
    if (shardCanMatch) GdxCodec.openRecordStream(path, header, meta, dimFilters)
    else null
  private val records: Iterator[GdxRecord] =
    if (stream == null) Iterator.empty else stream

  def firstVal(r: GdxRecord): Double =
    if (r.values.nonEmpty) r.values(0) else 0.0

  // raw mode: sentinels pass through as their finite 1e300 encodings —
  // the lossless representation the tool suite (merge/diff/dump) uses
  // for ALL five value fields (flag columns only describe values(0));
  // flag mode needs no special-casing here: toDouble already maps EPS
  // to 0.0, and the is_* columns carry the lossless bit
  def mapValue(v: Double): Double =
    if (raw) v else SpecialValues.toDouble(v)

  private def keep(r: GdxRecord): Boolean =
    dimFilters.forall { case (i, allowed) => allowed.contains(r.keys(i)) }

  /** Next record passing the residual per-record filter; null at end. */
  def nextKept(): GdxRecord = {
    while (records.hasNext) {
      val r = records.next()
      if (keep(r)) return r
    }
    null
  }

  /** Flyweight twin of [[nextKept]] for the columnar reader: decodes
    * into caller-owned arrays (no per-record allocation), returning the
    * 1-based text-pool index (0 = none) or -1 at stream end.
    */
  // LOCAL-MODE/PROBE-ONLY A/B escape hatch (ColProbe): read from
  // sys.props at scan construction ON THE EXECUTOR, so a driver-set
  // property does NOT propagate off local mode — by design. The lazy
  // path is the production default everywhere; this knob exists only
  // so a single-JVM probe can measure eager-vs-lazy on one host.
  private val lazyValues =
    sys.props.getOrElse("graft.gdx.lazyValues", "true").toBoolean

  def nextKeptInto(keys: Array[Int], values: Array[Double]): Int = {
    if (stream == null) return -1
    while (stream.hasNext) {
      if (lazyValues) {
        // lazy value materialization (r15): keys decode first; the value
        // bytes of a record the residual filter kills are SKIPPED, never
        // assembled — on selective scans whose blocks still match the
        // zone maps, that is most of the per-corpse decode cost
        val t = stream.nextKeysInto(keys)
        if (keepKeys(keys)) { stream.readValuesInto(values); return t }
        else stream.skipValues()
      } else {
        val t = stream.nextInto(keys, values)
        if (keepKeys(keys)) return t
      }
    }
    -1
  }

  private def keepKeys(keys: Array[Int]): Boolean =
    dimFilters.forall { case (i, allowed) => allowed.contains(keys(i)) }

  def textOf(t: Int): String = stream.textAt(t)

  /** Stored value arity of this symbol (0 set/alias, 1 parameter, 5). */
  val valueArity: Int = meta.typ match {
    case SymbolType.Set | SymbolType.Alias => 0
    case SymbolType.Parameter => 1
    case _ => 5
  }

  def close(): Unit = if (stream != null) stream.close()
}

class GdxSymbolReader(path: String, symbol: String, fullSchema: StructType,
    required: StructType, pushed: Seq[DimLabelFilter],
    raw: Boolean = false) extends PartitionReader[InternalRow] {

  private val core = new GdxSymbolDecode(path, symbol, pushed, raw)
  private val header = core.header
  private val meta = core.meta
  private var cur: GdxRecord = _
  private def firstVal(r: GdxRecord): Double = core.firstVal(r)
  private def mapValue(v: Double): Double = core.mapValue(v)

  // projection plan: for each required field, a function of the record
  private val emitters: Array[GdxRecord => Any] = required.fields.map { f =>
    f.name match {
      case n if n.startsWith("dim_") =>
        val i = n.stripPrefix("dim_").toInt - 1
        (r: GdxRecord) => UTF8String.fromString(header.uels(r.keys(i)))
      case "text" =>
        (r: GdxRecord) => r.text.map(UTF8String.fromString).orNull
      case "value" if meta.typ == SymbolType.Set || meta.typ == SymbolType.Alias =>
        (_: GdxRecord) => 1.0
      case "value" =>
        (r: GdxRecord) => mapValue(r.values(0))
      case "is_eps" => (r: GdxRecord) => firstVal(r) == SpecialValues.EPS
      case "is_na" => (r: GdxRecord) => firstVal(r) == SpecialValues.NA
      case "is_undef" => (r: GdxRecord) => firstVal(r) == SpecialValues.UNDEF
      case "is_acronym" => (r: GdxRecord) => SpecialValues.isAcronym(firstVal(r))
      case "acr_index" => (r: GdxRecord) => {
        val v = firstVal(r)
        if (SpecialValues.isAcronym(v)) SpecialValues.acronymIndex(v) else 0
      }
      case field =>
        val vi = ValField.names.indexOf(field)
        require(vi >= 0, s"unknown gdx field $field")
        (r: GdxRecord) => mapValue(if (vi < r.values.length) r.values(vi) else 0.0)
    }
  }

  override def next(): Boolean = { cur = core.nextKept(); cur != null }

  override def get(): InternalRow =
    new GenericInternalRow(emitters.map(e => e(cur)).toArray[Any])

  override def close(): Unit = core.close()
}

/** Vectorized symbol reader ([[SupportsColumnarReads]] path): decodes
  * straight into `OnHeapColumnVector`s and hands Spark whole
  * `ColumnarBatch`es — no per-row `GenericInternalRow` allocation, no
  * per-field boxing, and the downstream plan consumes the batch inside
  * whole-stage codegen's vectorized loop, the same contract as the
  * parquet vectorized reader (the r12 verdict's #4: at 100 TB the
  * row-at-a-time scan is the bottleneck). Dimension columns are
  * DICTIONARY-ENCODED since r14: the GDX UEL table is the dictionary
  * (labels byte-encode once per reader), each row stores only a 4-byte
  * UEL id, and `getUTF8String` decodes zero-copy through the
  * `Dictionary` hook — the identical layout the parquet reader gives
  * dictionary-encoded pages, eliminating the per-row label byte copy
  * the r13 reader paid. Same [[GdxSymbolDecode]] core as the row
  * reader: block skipping, pushed-filter residual, special-value
  * mapping all shared.
  */
class GdxSymbolColumnarReader(path: String, symbol: String,
    required: StructType, pushed: Seq[DimLabelFilter], raw: Boolean,
    batchSize: Int = GdxCodec.DefaultBlockSize)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.vectorized.{Dictionary, OnHeapColumnVector, WritableColumnVector}
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val core = new GdxSymbolDecode(path, symbol, pushed, raw)
  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, required)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))

  // lazily-encoded label bytes, keyed by UEL index (shared across dims)
  private val labelBytes = new Array[Array[Byte]](core.header.uels.length)
  private def bytesOf(uel: Int): Array[Byte] = {
    var b = labelBytes(uel)
    if (b == null) {
      b = core.header.uels(uel).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      labelBytes(uel) = b
    }
    b
  }

  /** The UEL table AS the column dictionary (r13 verdict #4): dim
    * columns store 4-byte dictionary IDs (the record's raw UEL index)
    * instead of copying each label's UTF-8 bytes into the vector per
    * row — the same layout the parquet vectorized reader uses for
    * dictionary-encoded pages. `decodeToBinary` returns the CACHED
    * per-UEL byte array (encoded once per reader), which
    * `getUTF8String` wraps zero-copy.
    */
  private val uelDict: Dictionary = new Dictionary {
    override def decodeToInt(id: Int): Int = throw new UnsupportedOperationException
    override def decodeToLong(id: Int): Long = throw new UnsupportedOperationException
    override def decodeToFloat(id: Int): Float = throw new UnsupportedOperationException
    override def decodeToDouble(id: Int): Double = throw new UnsupportedOperationException
    override def decodeToBinary(id: Int): Array[Byte] = bytesOf(id)
  }
  // per-column dictionary-id vectors (non-null only for dim_ columns)
  private val dimIds: Array[WritableColumnVector] =
    required.fields.zipWithIndex.map { case (f, c) =>
      if (f.name.startsWith("dim_")) {
        vectors(c).setDictionary(uelDict)
        vectors(c).reserveDictionaryIds(batchSize)
      } else null
    }

  // flyweight record state: the decode fills these caller-owned arrays
  // (no GdxRecord / keys / values allocation per record)
  private val recKeys = new Array[Int](math.max(core.meta.dim, 1))
  private val recVals = new Array[Double](5)
  private def firstVal: Double = if (core.valueArity == 0) 0.0 else recVals(0)
  // text-pool bytes encode once per distinct text (pool-sized cache)
  private val textBytes = new scala.collection.mutable.HashMap[Int, Array[Byte]]()

  // per-field vector fillers — the columnar twin of the row emitters;
  // textIdx is the 1-based text-pool index (0 = none)
  private val fillers: Array[(Int, Int, OnHeapColumnVector) => Unit] =
    required.fields.zipWithIndex.map[(Int, Int, OnHeapColumnVector) => Unit] { case (f, c) =>
      f.name match {
        case n if n.startsWith("dim_") =>
          val i = n.stripPrefix("dim_").toInt - 1
          val ids = dimIds(c)
          (_t, row, _v) => ids.putInt(row, recKeys(i))
        case "text" =>
          (t, row, v) =>
            if (t == 0) v.putNull(row)
            else {
              val b = textBytes.getOrElseUpdate(t, core.textOf(t)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              v.putByteArray(row, b, 0, b.length)
            }
        case "value" if core.meta.typ == SymbolType.Set ||
            core.meta.typ == SymbolType.Alias =>
          (_t, row, v) => v.putDouble(row, 1.0)
        case "value" =>
          (_t, row, v) => v.putDouble(row, core.mapValue(recVals(0)))
        case "is_eps" =>
          (_t, row, v) => v.putBoolean(row, firstVal == SpecialValues.EPS)
        case "is_na" =>
          (_t, row, v) => v.putBoolean(row, firstVal == SpecialValues.NA)
        case "is_undef" =>
          (_t, row, v) => v.putBoolean(row, firstVal == SpecialValues.UNDEF)
        case "is_acronym" =>
          (_t, row, v) => v.putBoolean(row, SpecialValues.isAcronym(firstVal))
        case "acr_index" =>
          (_t, row, v) => {
            val x = firstVal
            v.putInt(row, if (SpecialValues.isAcronym(x)) SpecialValues.acronymIndex(x) else 0)
          }
        case field =>
          val vi = ValField.names.indexOf(field)
          require(vi >= 0, s"unknown gdx field $field")
          (_t, row, v) => v.putDouble(row,
            core.mapValue(if (vi < core.valueArity) recVals(vi) else 0.0))
      }
    }

  override def next(): Boolean = {
    var i = 0
    while (i < vectors.length) {
      vectors(i).reset() // keeps the dictionary; ids vector resets below
      if (dimIds(i) != null) dimIds(i).reset()
      i += 1
    }
    var n = 0
    var t = core.nextKeptInto(recKeys, recVals)
    while (t >= 0) {
      var c = 0
      while (c < fillers.length) { fillers(c)(t, n, vectors(c)); c += 1 }
      n += 1
      t = if (n < batchSize) core.nextKeptInto(recKeys, recVals) else -1
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    batch.close()
    core.close()
  }
}
