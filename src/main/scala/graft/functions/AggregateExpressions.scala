package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst aggregate
  * (SPEC: the mergeable-summaries formulation, Agarwal et al. 2013
  * "Mergeable Summaries" §3 / Misra & Gries 1982) — the third sketch
  * family next to HLL distinct counts and the approx-percentile
  * digests: `mg_topk(col, k)` finds every item whose frequency
  * exceeds n/k using k−1 counters of state, no matter how many
  * distinct items stream past.
  *
  * Why a TypedImperativeAggregate and not an Aggregator/UDAF: the
  * sketch buffer is an open hash map that must MERGE map-side (the
  * whole point — each partition keeps k−1 counters, the shuffle
  * carries k−1 rows per partition, never the distinct-item space),
  * and the Catalyst-native form drops straight into `spark.sql` /
  * `call_function` with partial aggregation for free.
  *
  * Guarantees (the property test pins both):
  *  - any item with true count > n/k IS in the output;
  *  - every reported count is a LOWER bound, short by at most n/k.
  * The exact counter values depend on partition merge order (the
  * decrement step is order-sensitive), so the consumer registry row
  * is rows-only checked — like the HLL and k-means rows — with the
  * guarantees asserted in ScalaTest instead.
  *
  * Output: `array<struct<item:string, cnt:bigint>>`, counters sorted
  * (cnt desc, item asc), at most k−1 entries.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_topk needs a string column, got ${child.dataType.simpleString}")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"mg_topk needs k >= 2, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Classic MG update: known item +1; free counter slot → insert;
    * saturated → decrement ALL counters (dropping zeros) instead of
    * inserting. k−1 counters ⇒ each decrement event burns k
    * occurrences (the arriving one + k−1 held), so an item with
    * count > n/k cannot be fully cancelled.
    */
  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String].toString
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < k - 1 => buf.update(key, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { kk =>
          val nc = buf(kk) - 1
          if (nc == 0) dead += kk else buf.update(kk, nc)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  /** Mergeable-summaries merge: sum counters, then restore the k−1
    * bound by subtracting the k-th largest count from every counter
    * and dropping the non-positive ones (Agarwal et al. 2013 §3.1 —
    * error adds, staying ≤ n/k of the COMBINED stream).
    */
  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (kk, c) => buf.update(kk, buf.getOrElse(kk, 0L) + c) }
    if (buf.size > k - 1) {
      val kth = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { kk =>
        val nc = buf(kk) - kth
        if (nc <= 0) dead += kk else buf.update(kk, nc)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed UTF-8, NOT writeUTF: modified-UTF-8 caps entries
    // at 65535 bytes and a >64KB counted item (a long document body)
    // would crash the shuffle serialization mid-job
    buf.foreach { case (kk, c) =>
      val bs = kk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bs.length); out.write(bs); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val bs = new Array[Byte](in.readInt())
      in.readFully(bs)
      buf.update(new String(bs, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
  override def prettyName: String = "mg_topk"
}

/** Column-API entry point (resolved via GraftExtensions, like vec.*). */
object agg {
  import org.apache.spark.sql.functions.{call_function, lit}

  /** Misra-Gries heavy hitters: every item with frequency > n/k, with
    * lower-bound counts, in k−1 counters of state.
    */
  def mgTopK(col: Column, k: Int): Column = call_function("mg_topk", col, lit(k))

  /** Bloom filter over a LONG key column (Spark's own sketch — the
    * engine applies it internally for runtime join filters; exposed
    * here as a first-class aggregate so pipelines can BUILD a filter
    * once and pre-filter any number of downstream scans map-side).
    * Hash non-long keys with xxhash64 first, and use the same hash on
    * the probe side: no false negatives survive the pairing.
    */
  def bloomAgg(col: Column, expectedItems: Long): Column =
    call_function("bloom_agg", col, lit(expectedItems))

  /** Membership probe against a [[bloomAgg]] filter: true for every
    * inserted key, false-positive rate per the sizing. Codegen'd
    * (BloomFilterMightContain), so the probe runs inside the scan's
    * WholeStageCodegen span.
    */
  def bloomContains(bloom: Column, key: Column): Column =
    call_function("bloom_contains", bloom, key)
}
