package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Offset of the GDX file-arrival stream: the set of shard FILE NAMES
  * already processed. Name-set (not count or high-watermark) because
  * shard names carry task ids, so arrival order is not lexicographic
  * and a late-arriving writer must still be picked up exactly once.
  * Serialized as a sorted JSON string array (same minimal escaping as
  * the write manifest).
  */
case class GdxShardOffset(files: Seq[String]) extends Offset {
  override def json: String =
    files.sorted.map(f => "\"" + GdxManifest.js(f) + "\"").mkString("[", ",", "]")
}

object GdxShardOffset {
  private val entry = """"((?:[^"\\]|\\.)*)"""".r
  def fromJson(j: String): GdxShardOffset =
    GdxShardOffset(entry.findAllMatchIn(j).map(m => GdxManifest.unjs(m.group(1))).toSeq)
}

/** Streaming ingestion of a sharded GDX directory (readStream.format
  * ("gdx")): each micro-batch plans one InputPartition per NEWLY
  * ARRIVED shard file — the natural continuation of the sharded write
  * layout, where independent producers drop self-contained shard-*.gdx
  * files (own UEL table, own records) into the dataset directory. The
  * existing batch reader factory decodes each shard unchanged, so
  * batch and streaming reads share one decode path (batch parity is
  * asserted in StreamingSpec). Exactly-once at file granularity for
  * shards that stay put: offsets are processed-name sets and shards
  * are immutable once published (atomic rename). Caveat, inherent to
  * directory-arrival sources: a shard published by a task of an
  * upstream streaming epoch that later ABORTS may be listed, consumed,
  * and then deleted — replay skips the vanished file. Consumers that
  * need committed-only data should batch-read through the manifest
  * (GdxTable.committedShardsOf) instead.
  */
class GdxMicroBatchStream(path: String, symbol: String, fullSchema: StructType,
    required: StructType, pushed: Seq[DimLabelFilter],
    raw: Boolean = false) extends MicroBatchStream {

  require(symbol != GdxTable.CatalogSymbol, "gdx: the catalog view is not streamable")

  private def currentFiles: Seq[String] =
    GdxTable.shardsOf(path).map(p => new java.io.File(p).getName)

  override def initialOffset(): Offset = GdxShardOffset(Nil)

  override def latestOffset(): Offset = GdxShardOffset(currentFiles)

  override def deserializeOffset(json: String): Offset = GdxShardOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GdxShardOffset].files.toSet
    val dir = new java.io.File(path)
    end.asInstanceOf[GdxShardOffset].files.filterNot(seen).sorted.flatMap { n =>
      val full = if (dir.isDirectory) new java.io.File(dir, n).getPath else path
      // a shard recorded in an offset can vanish before replay (an
      // upstream epoch abort deleted its task-published files): skip it
      // rather than wedge the stream — directory-arrival sources are
      // at-least-once over such producers by nature
      if (new java.io.File(full).isFile)
        Some(GdxInputPartition(full, symbol): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GdxReaderFactory(fullSchema, required, pushed, symbol, raw)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
