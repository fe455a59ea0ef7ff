package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.gdx._

/** Scan with column pruning (gdx_scan_fields: only requested value
  * fields are materialized) and dim-label filter pushdown
  * (filter_label_eq: EqualTo/In on dim columns is applied on UEL
  * indices inside the decoder, before any row is built — label→index
  * lookup happens once per partition against the shard's UEL table).
  */
class GdxScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep full-schema field order for decode simplicity
    val names = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => names.contains(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(attr, _: String) => attr.startsWith("dim_")
      case In(attr, vs) if vs.forall(_.isInstanceOf[String]) => attr.startsWith("dim_")
      case _ => false
    }
    pushed = accepted
    rejected ++ accepted // accepted are exact, but let Spark re-check cheaply
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GdxScan(fullSchema, required, pushed, options)
}

class GdxScan(fullSchema: StructType, required: StructType, pushed: Array[Filter],
    options: CaseInsensitiveStringMap) extends Scan with Batch {

  private val path = options.get("path")
  private val symbol = Option(options.get("symbol")).getOrElse("")

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val shards = GdxTable.shardsOf(path)
    if (symbol == GdxTable.CatalogSymbol)
      Array(GdxCatalogPartition(shards))
    else prunedByManifest(shards).map(s => GdxInputPartition(s, symbol)).toArray
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
      case EqualTo("dim_1", v: String) => Set(v.toLowerCase)
      case In("dim_1", vs) => vs.collect { case s: String => s.toLowerCase }.toSet
    }.foldLeft(Option.empty[Set[String]]) {
      // multiple pushed filters on dim_1 → intersection semantics
      case (None, s) => Some(s)
      case (Some(acc), s) => Some(acc.intersect(s))
    }.getOrElse(return shards)
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
    new GdxReaderFactory(fullSchema, required, pushed, symbol)

  override def description(): String =
    s"GdxScan(path=$path, symbol=$symbol, pushed=${pushed.mkString(",")})"
}

case class GdxInputPartition(shardPath: String, symbol: String) extends InputPartition
case class GdxCatalogPartition(shardPaths: Seq[String]) extends InputPartition

class GdxReaderFactory(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], symbol: String) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case GdxCatalogPartition(shards) => new GdxCatalogReader(shards, required)
      case GdxInputPartition(shard, sym) =>
        new GdxSymbolReader(shard, sym, fullSchema, required, pushed)
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
    all.groupBy(_.name.toLowerCase).values.map { ms =>
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

class GdxSymbolReader(path: String, symbol: String, fullSchema: StructType,
    required: StructType, pushed: Array[Filter]) extends PartitionReader[InternalRow] {

  private val header = GdxCodec.readHeader(path)
  private val meta = GdxTable.resolveSymbol(header, symbol, path)
  private val flagMode = fullSchema.fieldNames.contains("is_eps")

  // label equality filters → UEL index predicates, resolved once here.
  // A label absent from this shard's UEL table matches nothing. Multiple
  // pushed filters on the same dim (EqualTo + In) intersect — matching
  // prunedByManifest's semantics — rather than last-wins.
  private val dimFilters: Map[Int, Set[Int]] = pushed.flatMap {
    case EqualTo(attr, v: String) =>
      Some(dimIndex(attr) -> Set(lookup(v)).filter(_ >= 0))
    case In(attr, vs) =>
      Some(dimIndex(attr) -> vs.map(v => lookup(v.asInstanceOf[String])).filter(_ >= 0).toSet)
    case _ => None
  }.groupBy(_._1).map { case (i, kvs) => i -> kvs.map(_._2).reduce(_ intersect _) }

  private def dimIndex(attr: String): Int = attr.stripPrefix("dim_").toInt - 1
  // O(1) per pushed label: one lowercased index map per reader. First
  // occurrence wins, matching the indexWhere semantics it replaces —
  // O(|UEL|) linear scans per filter don't survive 100 TB UEL tables.
  private lazy val uelIndex: Map[String, Int] = {
    val m = new scala.collection.mutable.HashMap[String, Int]()
    var i = 0
    while (i < header.uels.length) {
      val k = header.uels(i).toLowerCase
      if (!m.contains(k)) m.put(k, i)
      i += 1
    }
    m.toMap
  }
  private def lookup(label: String): Int =
    uelIndex.getOrElse(label.toLowerCase, -1)

  // shard skip: a pushed label absent from this shard's UEL table can
  // match nothing here — with the clustered write layout each label
  // lives in exactly one shard, so every other shard skips its record
  // blob entirely (header-only read).
  private val shardCanMatch = dimFilters.valuesIterator.forall(_.nonEmpty)

  // streaming decode: records inflate one at a time — task memory is
  // O(UEL table), never O(shard records)
  private val stream: GdxCodec.GdxRecordStream =
    if (shardCanMatch) GdxCodec.openRecordStream(path, header, meta) else null
  private val records: Iterator[GdxRecord] =
    if (stream == null) Iterator.empty else stream
  private var cur: GdxRecord = _

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
      case field =>
        val vi = ValField.names.indexOf(field)
        require(vi >= 0, s"unknown gdx field $field")
        (r: GdxRecord) => mapValue(if (vi < r.values.length) r.values(vi) else 0.0)
    }
  }

  private def firstVal(r: GdxRecord): Double =
    if (r.values.nonEmpty) r.values(0) else 0.0

  private def mapValue(v: Double): Double =
    if (flagMode && v == SpecialValues.EPS) 0.0 else SpecialValues.toDouble(v)

  private def keep(r: GdxRecord): Boolean =
    dimFilters.forall { case (i, allowed) => allowed.contains(r.keys(i)) }

  override def next(): Boolean = {
    while (records.hasNext) {
      val r = records.next()
      if (keep(r)) { cur = r; return true }
    }
    false
  }

  override def get(): InternalRow =
    new GenericInternalRow(emitters.map(e => e(cur)).toArray[Any])

  override def close(): Unit = if (stream != null) stream.close()
}
