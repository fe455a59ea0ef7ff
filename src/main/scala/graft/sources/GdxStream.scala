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
  private def js(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
  override def json: String =
    files.sorted.map(f => "\"" + js(f) + "\"").mkString("[", ",", "]")
}

object GdxShardOffset {
  private val entry = """"((?:[^"\\]|\\.)*)"""".r
  private def unjs(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
  def fromJson(j: String): GdxShardOffset =
    GdxShardOffset(entry.findAllMatchIn(j).map(m => unjs(m.group(1))).toSeq)
}

/** Streaming ingestion of a sharded GDX directory (readStream.format
  * ("gdx")): each micro-batch plans one InputPartition per NEWLY
  * ARRIVED shard file — the natural continuation of the sharded write
  * layout, where independent producers drop self-contained shard-*.gdx
  * files (own UEL table, own records) into the dataset directory. The
  * existing batch reader factory decodes each shard unchanged, so
  * batch and streaming reads share one decode path (batch parity is
  * asserted in StreamingSpec). Exactly-once at file granularity:
  * offsets are processed-name sets, and shards are immutable once
  * committed (the writer's task files appear atomically via commit).
  */
class GdxMicroBatchStream(path: String, symbol: String, fullSchema: StructType,
    required: StructType, pushed: Seq[DimLabelFilter]) extends MicroBatchStream {

  require(symbol != GdxTable.CatalogSymbol, "gdx: the catalog view is not streamable")

  private def currentFiles: Seq[String] =
    GdxTable.shardsOf(path).map(p => new java.io.File(p).getName)

  override def initialOffset(): Offset = GdxShardOffset(Nil)

  override def latestOffset(): Offset = GdxShardOffset(currentFiles)

  override def deserializeOffset(json: String): Offset = GdxShardOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GdxShardOffset].files.toSet
    val dir = new java.io.File(path)
    end.asInstanceOf[GdxShardOffset].files.filterNot(seen).sorted.map { n =>
      val full = if (dir.isDirectory) new java.io.File(dir, n).getPath else path
      GdxInputPartition(full, symbol): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GdxReaderFactory(fullSchema, required, pushed, symbol)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
