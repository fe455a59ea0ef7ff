package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gdx.{Gdx, GdxStreamEncoder, SymbolType}

/** Streaming semantics (SURVEY.md §5.2#5): MemoryStream-driven tests for
  * watermark late-drop, session merging, stateful funnel, dedup —
  * asserting batch/stream parity where the batch fixpoint is defined.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

case class Doc(doc_id: Long, ts: Timestamp, text: String)

case class Vec(vec_id: Long, embedding: Array[Float])

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.build("local[4]", "4")

  import spark.implicits._

  private def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  private var qn = 0
  private def nextName(): String = { qn += 1; s"stream_out_$qn" }

  test("tumbling window counts match batch on the same data") {
    val events = Seq(
      Ev(1, t(0, 10), 1, "click", 1.0), Ev(2, t(0, 40), 1, "view", 2.0),
      Ev(3, t(1, 5), 2, "click", 3.0), Ev(4, t(2, 0), 2, "click", 4.0))
    val ms = MemoryStream[Ev](spark)
    ms.addData(events: _*)
    val name = nextName()
    val q = StreamOps.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(name).orderBy("win_start", "event_type").collect()
    val batch = events.toDF()
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("windowed top-k: streaming count state + downstream rank matches the batch query") {
    // rank is not incremental — production shape is the incremental
    // windowed COUNT (complete/update state) with the top-k rank applied
    // per finalized window downstream; parity = that composition equals
    // the one-shot batch window+rank on the same data.
    val events = Seq(
      Ev(1, t(0, 10), 1, "click", 1.0), Ev(2, t(0, 20), 1, "click", 1.0),
      Ev(3, t(0, 30), 2, "view", 1.0), Ev(4, t(0, 40), 3, "view", 1.0),
      Ev(5, t(0, 50), 2, "view", 1.0), Ev(6, t(1, 10), 1, "purchase", 1.0),
      Ev(7, t(6, 0), 1, "error", 1.0), Ev(8, t(6, 30), 2, "error", 1.0),
      Ev(9, t(7, 0), 1, "click", 1.0))
    val ms = MemoryStream[Ev](spark)
    ms.addData(events.take(5): _*)
    val name = nextName()
    val q = ms.toDF()
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    q.processAllAvailable()
    ms.addData(events.drop(5): _*) // second batch updates existing + opens a window
    q.processAllAvailable(); q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("win_start").orderBy(col("n").desc, col("event_type").asc)
    val streamed = spark.table(name)
      .select(unix_micros(col("window.start")).as("win_start"), col("event_type"), col("n"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .orderBy("win_start", "rk").collect()
    val batch = events.toDF()
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start"), col("event_type"), col("n"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .orderBy("win_start", "rk").collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("mg_topk heavy hitters aggregate under a streaming window") {
    // the native TypedImperativeAggregate must serialize its sketch
    // buffer through the streaming state store and keep its guarantee
    // (every item with freq > n/k present) across incremental batches
    val ms = MemoryStream[Ev](spark)
    val name = nextName()
    val q = ms.toDF()
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(graft.functions.agg.mgTopK(col("event_type"), 4).as("hh"))
      .select(unix_micros(col("window.start")).as("win_start"), col("hh"))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    ms.addData((1 to 6).map(i => Ev(i, t(0, i), 1, "hot", 1.0)): _*)
    q.processAllAvailable()
    ms.addData(Ev(7, t(1), 1, "hot", 1.0), Ev(8, t(2), 2, "rare", 1.0),
      Ev(9, t(3), 3, "other", 1.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table(name).collect()
    assert(rows.length == 1)
    val items = rows.head.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 7 of 9 "hot" > 9/4 → guaranteed present, count within the MG band
    assert(items.contains("hot"), s"heavy hitter lost across batches: $items")
    assert(items("hot") <= 7 && items("hot") >= 7 - 9 / 4)
  }

  test("watermark drops events later than 10 minutes") {
    val ms = MemoryStream[Ev](spark)
    val name = nextName()
    val q = StreamOps.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // batch 1: window 10:00 gets 2 events; max ts 10:15 → watermark 10:05
    ms.addData(Ev(1, t(0, 10), 1, "click", 1.0), Ev(2, t(0, 50), 1, "click", 1.0),
      Ev(3, t(15), 1, "view", 1.0))
    q.processAllAvailable()
    // batch 2: late event for the already-finalized 10:00 window
    ms.addData(Ev(4, t(0, 30), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name).filter(col("event_type") === "click").collect()
    // the 10:00 click window was emitted once with n=2; the late click
    // neither re-emits nor bumps it
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000, 2L)))
  }

  test("session windows merge events within 30-minute gaps") {
    val events = Seq(
      Ev(1, t(0), 7, "click", 1.0), Ev(2, t(10), 7, "click", 1.0), // session 1
      Ev(3, t(50), 7, "click", 1.0), // gap 40 min → session 2
      Ev(4, t(5), 8, "view", 1.0)) // other user
    val ms = MemoryStream[Ev](spark)
    ms.addData(events: _*)
    val name = nextName()
    val q = StreamOps.sessionCounts(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table(name).orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((7L, 2L), (7L, 1L), (8L, 1L)))
  }

  test("dropDuplicatesWithinWatermark dedups re-delivered event_ids") {
    val ms = MemoryStream[Ev](spark)
    val name = nextName()
    val q = StreamOps.dedupEvents(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    ms.addData(Ev(1, t(0), 1, "click", 1.0), Ev(1, t(0), 1, "click", 1.0))
    q.processAllAvailable()
    ms.addData(Ev(1, t(1), 1, "click", 1.0)) // same id, within watermark
    q.processAllAvailable()
    q.stop()
    assert(spark.table(name).count() == 1)
  }

  test("funnel emits user exactly once after view→click→purchase in order") {
    val ms = MemoryStream[StreamOps.FunnelEvent](spark)
    val name = nextName()
    val q = StreamOps.funnel(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // user 1 completes across batches; user 2 out of order (never completes)
    ms.addData(
      StreamOps.FunnelEvent(1, t(0), "view"),
      StreamOps.FunnelEvent(2, t(0), "click"))
    q.processAllAvailable()
    ms.addData(
      StreamOps.FunnelEvent(1, t(1), "click"),
      StreamOps.FunnelEvent(1, t(2), "purchase"),
      StreamOps.FunnelEvent(2, t(1), "view"),
      StreamOps.FunnelEvent(2, t(2), "purchase"))
    q.processAllAvailable()
    ms.addData(StreamOps.FunnelEvent(1, t(3), "purchase")) // second purchase: no re-emit
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("transformWithState funnel matches flatMapGroupsWithState on the same input") {
    // v2 state API requires the RocksDB provider on the running query
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[StreamOps.FunnelEvent](spark)
      val name = nextName()
      val q = StreamOps.funnelV2(ms.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      ms.addData(
        StreamOps.FunnelEvent(1, t(0), "view"),
        StreamOps.FunnelEvent(2, t(0), "click"))
      q.processAllAvailable()
      ms.addData(
        StreamOps.FunnelEvent(1, t(1), "click"),
        StreamOps.FunnelEvent(1, t(2), "purchase"),
        StreamOps.FunnelEvent(2, t(1), "view"),
        StreamOps.FunnelEvent(2, t(2), "purchase"))
      q.processAllAvailable()
      ms.addData(StreamOps.FunnelEvent(1, t(3), "purchase")) // no re-emit
      q.processAllAvailable()
      q.stop()
      val out = spark.table(name).collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(1L))
      assert(out.head.getTimestamp(1) == t(2)) // completed at first purchase
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("funnel parity: click before first view never completes; reversed arrival does") {
    val ms = MemoryStream[StreamOps.FunnelEvent](spark)
    val name = nextName()
    val q = StreamOps.funnel(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // user 3: click precedes the first view — the batch fixpoint
    // (first view < first click < first purchase) rejects it, and the
    // min-timestamp fold must too (a stage machine that IGNORES the
    // early click would wrongly complete this user)
    ms.addData(
      StreamOps.FunnelEvent(3, t(0), "click"),
      StreamOps.FunnelEvent(3, t(1), "view"),
      StreamOps.FunnelEvent(3, t(2), "click"),
      StreamOps.FunnelEvent(3, t(3), "purchase"))
    // user 4: completes, but the steps ARRIVE purchase-first across
    // batches — min() is arrival-order-independent, so the hit lands
    // once the last missing step (the view) shows up
    ms.addData(StreamOps.FunnelEvent(4, t(2), "purchase"))
    q.processAllAvailable()
    assert(spark.table(name).count() == 0)
    ms.addData(
      StreamOps.FunnelEvent(4, t(0), "view"),
      StreamOps.FunnelEvent(4, t(1), "click"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(4L))
    assert(out.head.getTimestamp(1) == t(2)) // first purchase, exact micros
  }

  test("funnel TTL: dormant state evicts; continued activity extends retention") {
    val ms = MemoryStream[StreamOps.FunnelEvent](spark)
    val name = nextName()
    val q = StreamOps.funnel(
        ms.toDS().withWatermark("ts", "0 seconds").as[StreamOps.FunnelEvent],
        ttl = Some(java.time.Duration.ofMinutes(5)))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // u1's retention clock ends at 10:05
    ms.addData(StreamOps.FunnelEvent(1, t(0), "view"))
    q.processAllAvailable()
    // u2 advances the watermark to 10:10 (publishes at batch end)
    ms.addData(StreamOps.FunnelEvent(2, t(10), "view"))
    q.processAllAvailable()
    // u1 RE-APPEARS in the batch where the watermark (10:10) already
    // passed its old 10:05 timeout: the data callback must extend the
    // retention clock from LAST activity (10:11 + 5), not re-arm the
    // stale first-occurrence one — which Spark would reject as
    // below-watermark, crashing the query (and a first-occurrence
    // basis would evict this never-dormant user mid-funnel)
    ms.addData(StreamOps.FunnelEvent(1, t(11), "view"))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.head.numRowsTotal == 2,
      "active u1 must survive (u1 + u2)")
    // u3 advances the watermark to 10:30: u1 (10:16) and u2 (10:15)
    // both lapse; eviction emits nothing
    ms.addData(StreamOps.FunnelEvent(3, t(30), "view"))
    q.processAllAvailable()
    ms.addData(StreamOps.FunnelEvent(4, t(31), "view"))
    q.processAllAvailable()
    assert(spark.table(name).count() == 0)
    assert(q.lastProgress.stateOperators.head.numRowsTotal == 2,
      "u1/u2 evicted after retention, u3 + u4 remain")
    q.stop()
  }

  test("funnel finality: watermarked hits wait for the watermark; a late " +
      "in-watermark click before the first view retracts the completion") {
    val ms = MemoryStream[StreamOps.FunnelEvent](spark)
    val name = nextName()
    // 10-minute watermark delay so genuinely-late events are admitted;
    // 5-minute TTL so retirement is also exercised past the flush.
    val q = StreamOps.funnel(
        ms.toDS().withWatermark("ts", "10 minutes").as[StreamOps.FunnelEvent],
        ttl = Some(java.time.Duration.ofMinutes(5)))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // Both users complete in-order within batch 1, but the watermark
    // (still at epoch) has not passed their completion time t(7):
    // NOTHING may be emitted yet — an Append row is unretractable.
    ms.addData(
      StreamOps.FunnelEvent(10, t(5), "view"),
      StreamOps.FunnelEvent(10, t(6), "click"),
      StreamOps.FunnelEvent(10, t(7), "purchase"),
      StreamOps.FunnelEvent(11, t(5), "view"),
      StreamOps.FunnelEvent(11, t(6), "click"),
      StreamOps.FunnelEvent(11, t(7), "purchase"))
    q.processAllAvailable()
    assert(spark.table(name).count() == 0,
      "hit emitted before the watermark covered its completion time")
    // u10's LATE click at t(1) — admissible (t(1) ≥ watermark) and
    // earlier than u10's first view, so the batch fixpoint now REJECTS
    // u10. Had batch 1 emitted eagerly, this would be a contradiction.
    ms.addData(StreamOps.FunnelEvent(10, t(1), "click"))
    q.processAllAvailable()
    // Advance the watermark past t(7) (and past both retention clocks):
    // u11's pending hit must flush via the event-time timer; u10 must
    // retire silently.
    ms.addData(StreamOps.FunnelEvent(99, t(40), "view"))
    q.processAllAvailable()
    ms.addData(StreamOps.FunnelEvent(98, t(41), "view"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(11L),
      "exactly the still-valid completion flushes")
    assert(out.head.getTimestamp(1) == t(7)) // first purchase, exact micros
  }

  test("sliding windows: each event lands in 5 windows") {
    val ms = MemoryStream[Ev](spark)
    ms.addData(Ev(1, t(10), 1, "click", 2.0))
    val name = nextName()
    val q = StreamOps.slidingAvg(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table(name).count() == 5)
  }

  test("streaming Page CUSUM fold matches the batch closed form on the real slice") {
    // the batch row computes the fold via the reflection identity
    // (prefix sum − running min, two windows); the streaming form runs
    // the textbook recurrence with O(1) state — parity across a
    // 3-micro-batch time-ordered feed proves they are the same fold
    val dir = "/root/testdata/sf0.001"
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime / 1000 * 1000000 + ts.getNanos / 1000
    val evs = graft.T(spark, dir, "events")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => StreamOps.CusumEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), math.round(r.getDouble(3) * 100)))
      .sortBy(e => (us(e.ts), e.event_id)) // global time order → per-user in-order batches
    val kCents = evs.map(_.cents).sum / evs.length
    val ms = MemoryStream[StreamOps.CusumEvent](spark)
    val name = nextName()
    val q = StreamOps.pageCusum(ms.toDS(), kCents)
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { batch =>
      ms.addData(batch.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    // last emission per user = final state (n_events grows monotonically)
    val streamed = spark.table(name).collect()
      .groupBy(_.getLong(0)).map { case (_, rs) => rs.maxBy(_.getLong(1)) }
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    val batchRows = graft.SparkEntry.queries("ts_page_cusum")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(streamed == batchRows)
    // the alarm machinery is actually exercised on this slice
    assert(batchRows.exists(_._4 > 0))
  }

  test("streaming event-pattern DFA matches batch win_event_pattern across micro-batches") {
    val dir = "/root/testdata/sf0.001"
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime / 1000 * 1000000 + ts.getNanos / 1000
    val evs = graft.T(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => StreamOps.PatternEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3).substring(0, 1)))
      .sortBy(e => (us(e.ts), e.event_id)) // per-user in-order batches
    val ms = MemoryStream[StreamOps.PatternEvent](spark)
    val name = nextName()
    val q = StreamOps.eventPattern(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { batch =>
      ms.addData(batch.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    // last emission per user = final state (seq_len grows monotonically)
    val streamed = spark.table(name).collect()
      .groupBy(_.getLong(0)).map { case (_, rs) => rs.maxBy(_.getLong(1)) }
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val batchRows = graft.SparkEntry.queries("win_event_pattern")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getInt(2).toLong,
        r.getString(3))).toSet
    assert(streamed == batchRows)
    // the journey actually completes for someone on this slice, and a
    // cross-batch match exists only if state carried over correctly
    assert(batchRows.exists(_._3 > 0))
  }

  test("stream_approx_distinct: streamed HLL estimates equal the batch fold " +
      "bit-for-bit and grow monotonically across micro-batches") {
    val dir = "/root/testdata/sf0.001"
    val evs = graft.T(spark, dir, "events")
      .select("event_type", "user_id", "event_id").collect()
      .sortBy(_.getLong(2))
      .map(r => StreamOps.DistinctEvent(r.getString(0), r.getLong(1)))
    val ms = MemoryStream[StreamOps.DistinctEvent](spark)
    val name = nextName()
    val q = StreamOps.approxDistinct(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    val perBatch = scala.collection.mutable.ListBuffer.empty[Map[String, Long]]
    evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { batch =>
      ms.addData(batch.toIndexedSeq: _*)
      q.processAllAvailable()
      // latest emission per key after this batch (occupied grows with
      // the sketch, so max-by-occupied is the batch's final row)
      perBatch += spark.table(name).collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) => k -> rs.maxBy(_.getLong(1)).getLong(2) }
    }
    q.stop()
    // monotone non-decreasing per key across batches
    perBatch.sliding(2).foreach { w =>
      w(0).foreach { case (k, e0) => assert(w(1)(k) >= e0, s"$k estimate shrank") }
    }
    // bit-for-bit parity with the batch register fold of ALL slices
    val batchDf = evs.map(e => (e.event_type, e.user_id)).toSeq.toDF("grp", "v")
    val batchEst = graft.ops.RelationalOps.hllEstimate(
        graft.ops.RelationalOps.hllRegisters(batchDf, "v", "grp"), "est", "grp")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perBatch.last == batchEst,
      s"stream ${perBatch.last} != batch $batchEst")
    // and the sketch is actually estimating: within 10% of exact truth
    val truth = evs.map(e => (e.event_type, e.user_id)).distinct
      .groupBy(_._1).map { case (k, vs) => k -> vs.length.toLong }
    batchEst.foreach { case (k, est) =>
      assert(math.abs(est - truth(k)).toDouble / truth(k) < 0.10,
        s"$k: estimate $est vs truth ${truth(k)}")
    }
  }

  test("committedOnly offsets are O(1) manifest prefixes; old name-set checkpoints resume") {
    import graft.sources.{GdxManifestOffset, GdxMicroBatchStream, GdxShardOffset}
    val dir = java.nio.file.Files.createTempDirectory("gdx-moff").toString + "/data"
    (0 until 40).map(i => (f"k$i%02d", i.toDouble)).toDF("dim_1", "value")
      .repartition(2).write.format("gdx").mode("overwrite").option("symbol", "s").save(dir)
    val schema = spark.read.format("gdx").option("symbol", "s").load(dir).schema
    val ms = new GdxMicroBatchStream(dir, "s", schema, schema, Nil,
      raw = false, committedOnly = true)
    // latest offset is a prefix COUNT, serialized O(1) — not the name set
    val names = graft.sources.GdxManifest.files(dir).get
    val latest = ms.latestOffset().asInstanceOf[GdxManifestOffset]
    assert(latest.n == names.size && latest.json == s"""{"n":${names.size}}""")
    assert(ms.deserializeOffset(latest.json) == latest)
    // full range plans every shard; equal range plans none
    assert(ms.planInputPartitions(GdxManifestOffset(0), latest).length == names.size)
    assert(ms.planInputPartitions(latest, latest).isEmpty)
    // UPGRADE path: a checkpoint written by the old name-set scheme
    // resumes under manifest offsets — already-processed names are not
    // replayed, unseen manifest entries are
    val oldCkpt = ms.deserializeOffset(
      GdxShardOffset(Seq(names.head)).json).asInstanceOf[GdxShardOffset]
    assert(oldCkpt.files == Seq(names.head))
    val planned = ms.planInputPartitions(oldCkpt, latest)
    assert(planned.length == names.size - 1)
    // a manifest shrinking below a recorded offset is committed-data
    // loss and must fail loudly, not silently replan
    intercept[IllegalStateException] {
      ms.planInputPartitions(GdxManifestOffset(0), GdxManifestOffset(99))
    }
  }

  test("gdx readStream in raw mode streams sentinel encodings losslessly") {
    import graft.gdx.SpecialValues
    val dir = java.nio.file.Files.createTempDirectory("gdx-stream-raw").toString + "/data"
    Seq(("e", SpecialValues.EPS), ("n", SpecialValues.NA), ("p", 2.5))
      .toDF("dim_1", "value")
      .write.format("gdx").mode("overwrite")
      .option("symbol", "s").option("specialValues", "raw").save(dir)
    val name = nextName()
    val q = spark.readStream.format("gdx")
      .option("symbol", "s").option("specialValues", "raw").load(dir)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table(name).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("e" -> SpecialValues.EPS, "n" -> SpecialValues.NA, "p" -> 2.5))
  }

  test("gdx readStream: batch parity on existing shards, new shards ingested incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("gdx-stream").toString + "/data"
    (0 until 100).map(i => (f"a$i%03d", i.toDouble)).toDF("dim_1", "value")
      .repartition(2).write.format("gdx").mode("overwrite").option("symbol", "s").save(dir)
    val name = nextName()
    val q = spark.readStream.format("gdx").option("symbol", "s").load(dir)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    val first = spark.table(name).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = spark.read.format("gdx").option("symbol", "s").load(dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(first == batch && first.size == 100,
      "stream over the initial shard set must equal the batch read")
    // a new producer drops one more self-contained shard into the dataset
    val enc = new graft.gdx.GdxStreamEncoder(s"$dir/shard-99999-9.gdx", "s",
      graft.gdx.SymbolType.Parameter, 1)
    enc.add(Array("z1"), Array(1000.0), None)
    enc.add(Array("z2"), Array(1001.0), None)
    enc.finish()
    q.processAllAvailable()
    q.stop()
    val after = spark.table(name).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after.size == 102 && after("z1") == 1000.0 && after("z2") == 1001.0,
      "the arriving shard must be planned exactly once as a new micro-batch")
  }

  test("corpus-dedup stream: standing-corpus dups dropped, re-deliveries deduped, novel flows") {
    val corpus = Seq("existing doc one", "existing doc two").toDF("text")
      .select(sha2(lower(trim(col("text"))), 256).as("h"))
    val ms = MemoryStream[Doc](spark)
    val name = nextName()
    val q = graft.streaming.StreamOps.corpusDedup(ms.toDF(), corpus)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    ms.addData(
      Doc(1, t(0), "existing doc one"), // already in the corpus → dropped
      Doc(2, t(1), "novel alpha"),      // novel → emitted
      Doc(3, t(2), "novel alpha"))      // in-batch re-delivery → deduped
    q.processAllAvailable()
    ms.addData(
      Doc(4, t(3), "novel alpha"),       // cross-batch re-delivery, within watermark → deduped
      Doc(5, t(4), "existing doc two"),  // corpus dup → dropped
      Doc(6, t(5), "novel beta"))        // novel → emitted
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got === Set(2L, 6L), s"only first-seen novel docs may pass: $got")
  }

  test("corpus NEAR-dup stream: standing near-dup dropped, novel passes, cross-batch near-dup dropped") {
    val idx = java.nio.file.Files.createTempDirectory("neardup-idx").toString
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    graft.streaming.StreamOps.seedNearDupIndex(
      Seq((100L, corpusText)).toDF("doc_id", "text"), idx)
    val novel1 = "one two three four five six seven eight nine ten"
    val novel2 = "eleven twelve thirteen fourteen fifteen sixteen seventeen"
    // shares only the leading 3-shingle family with the corpus doc —
    // candidates may band-collide, but exact Jaccard ≈ 0.08 < τ → kept
    val subTau = "alpha beta gamma something entirely different lives here"
    val ms = MemoryStream[Doc](spark)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = graft.streaming.StreamOps.corpusNearDup(ms.toDF(), idx)(kept =>
      got.synchronized { got ++= kept.collect().map(_.getAs[Long]("doc_id")) })
    try {
      ms.addData(
        Doc(1, t(0), corpusText), // near-dup (j=1) of the standing corpus → dropped
        Doc(2, t(1), novel1))     // novel → kept, appended to the index
      q.processAllAvailable()
      ms.addData(
        Doc(3, t(2), novel1),     // CROSS-BATCH near-dup of kept doc 2 → dropped
        Doc(4, t(3), novel2),     // novel → kept
        Doc(6, t(5), novel2),     // IN-BATCH near-dup of 4 (neither indexed yet):
                                  // min-doc_id representative wins → dropped
        Doc(5, t(4), subTau))     // below-τ overlap with corpus → kept
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet === Set(2L, 4L, 5L),
      s"kept set wrong: ${got.toSet} (index at $idx)")
    // the index grew by exactly the kept docs
    val indexed = spark.read.parquet(s"$idx/shingles")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed === Set(100L, 2L, 4L, 5L))
  }

  test("semdedup stream: keep/drop parity with the batch keep-list over 3 micro-batches + a replayed slice") {
    val dir = "/root/testdata/sf0.001"
    val idx = java.nio.file.Files.createTempDirectory("semdedup-idx").toString
    // batch fixpoint: the registered dedup_semdedup_keep row on the
    // full table (vec_id, canonical, keep)
    val truth = graft.SparkEntry.queries("dedup_semdedup_keep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val vecs = graft.T(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[Vec]
      .collect().sortBy(_.vec_id)
    assert(vecs.nonEmpty && truth.size == vecs.length)
    // id-ordered terciles: the arrival order under which streaming
    // first-arrival representatives coincide with batch min-id
    // canonicals (the documented append-only-decision contract)
    val third = (vecs.length + 2) / 3
    val slices = vecs.grouped(third).toSeq
    val ms = MemoryStream[Vec](spark)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
    val q = graft.streaming.StreamOps.corpusSemDedup(ms.toDF(), idx)(out =>
      got.synchronized {
        got ++= out.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      })
    try {
      for (sl <- slices) { ms.addData(sl: _*); q.processAllAvailable() }
      val before = got.synchronized(got.toVector)
      // at-least-once redelivery: a committed epoch replays verbatim
      ms.addData(slices(1): _*)
      q.processAllAvailable()
      val after = got.synchronized(got.toVector)
      val replayed = after.drop(before.size)
      assert(replayed.toSet ==
        before.filter(d => slices(1).exists(_.vec_id == d._1)).toSet,
        "a replayed slice must re-emit IDENTICAL decisions")
    } finally q.stop()
    val decisions = got.synchronized(got.toVector)
    // no vector may ever receive two different decisions
    val conflicting = decisions.groupBy(_._1).filter(_._2.distinct.size > 1)
    assert(conflicting.isEmpty, s"conflicting decisions: ${conflicting.keys.take(5)}")
    assert(decisions.toSet == truth,
      s"stream/batch divergence: stream-only=${(decisions.toSet -- truth).take(5)} " +
        s"batch-only=${(truth -- decisions.toSet).take(5)}")
    // the index grew by exactly the representative set (all reps,
    // dropped ones included — that is what resolves chains)
    val indexed = spark.read.parquet(s"$idx/reps").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val repTruth = vecs.groupBy(_.embedding.toSeq).values.map(_.map(_.vec_id).min).toSet
    assert(indexed == repTruth, s"index must hold exactly the reps once")
  }

  test("committedOnly stream: membership is the manifest, aborted-epoch shards invisible") {
    val dir = java.nio.file.Files.createTempDirectory("gdx-stream-co").toString + "/data"
    (0 until 50).map(i => (f"a$i%03d", i.toDouble)).toDF("dim_1", "value")
      .repartition(2).write.format("gdx").mode("overwrite").option("symbol", "s").save(dir)
    // an upstream task publishes a shard whose epoch then ABORTS: the
    // file is in the directory listing but never reaches the manifest
    val orphan = new GdxStreamEncoder(s"$dir/shard-77777-1.gdx", "s",
      SymbolType.Parameter, 1)
    orphan.add(Array("orph"), Array(-1.0), None)
    orphan.finish()
    val name = nextName()
    val q = spark.readStream.format("gdx").option("symbol", "s")
      .option("committedOnly", "true").load(dir)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    val first = spark.table(name).collect().map(_.getString(0)).toSet
    assert(first.size == 50 && !first.contains("orph"),
      "unmanifested shard must be invisible in committedOnly mode")
    // a committed append (shards + manifest entry) flows on incrementally
    Seq(("z1", 1000.0)).toDF("dim_1", "value")
      .write.format("gdx").mode("append").option("symbol", "s").save(dir)
    q.processAllAvailable()
    q.stop()
    val after = spark.table(name).collect().map(_.getString(0)).toSet
    assert(after.contains("z1") && !after.contains("orph") && after.size == 51,
      s"committed shards must flow, orphans must stay invisible: $after")
  }

  test("stream-static join enriches the stream against a broadcast dimension") {
    val events = Seq(
      Ev(1, t(0), 10, "click", 1.0), Ev(2, t(1), 10, "view", 2.0),
      Ev(3, t(2), 11, "click", 4.0), Ev(4, t(3), 12, "click", 8.0))
    val dim = Seq((10L, "BUILDING"), (11L, "MACHINERY"), (12L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val ms = MemoryStream[Ev](spark)
    ms.addData(events: _*)
    val name = nextName()
    val q = StreamOps.staticEnrich(ms.toDF(), dim)
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table(name).orderBy("c_mktsegment", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("BUILDING", "click", 2L, 9.0), ("BUILDING", "view", 1L, 2.0),
      ("MACHINERY", "click", 1L, 4.0)))
  }

  test("stream-stream interval join attributes purchases to clicks within 10 minutes") {
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val name = nextName()
    val q = StreamOps.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    clicks.addData(Ev(1, t(0), 1, "click", 0), Ev(2, t(5), 2, "click", 0))
    purchases.addData(
      Ev(100, t(4), 1, "purchase", 0),  // 4 min after click 1 → joins
      Ev(101, t(20), 2, "purchase", 0), // 15 min after click 2 → outside window
      Ev(102, t(6), 3, "purchase", 0))  // no click for user 3
    q.processAllAvailable(); q.stop()
    val out = spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 100L)),
      "only the within-10-min same-user pair may join")
  }

  test("gdx sink rejects complete output mode instead of duplicating epochs") {
    val base = java.nio.file.Files.createTempDirectory("gdx-complete").toString
    val ms = MemoryStream[Ev](spark)
    ms.addData(Ev(1, t(0), 1, "click", 1.0))
    val q = ms.toDF().groupBy("event_type").count()
      .select(col("event_type").as("dim_1"), col("count").cast("double").as("value"))
      .writeStream.format("gdx")
      .option("symbol", "s")
      .option("checkpointLocation", s"$base/cp")
      .outputMode("complete")
      .start(s"$base/out")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable(); q.stop()
    }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")),
      s"expected the append-only rejection, got: ${e.getMessage}")
  }

  test("gdx readStream starts on an empty directory with a declared schema") {
    val base = java.nio.file.Files.createTempDirectory("gdx-empty-src").toString
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    val name = nextName()
    // consumer starts FIRST (the production deployment order) …
    val q = spark.readStream.format("gdx")
      .option("symbol", "s").option("dims", "1").load(src)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table(name).count() == 0)
    // … then a producer drops the first shard
    val enc = new GdxStreamEncoder(s"$src/shard-00000-1.gdx", "s",
      SymbolType.Parameter, 1)
    enc.add(Array("a"), Array(1.0), None)
    enc.finish()
    q.processAllAvailable(); q.stop()
    val rows = spark.table(name).collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(rows.toSeq == Seq("a" -> 1.0))
  }

  test("continuous curation pipe: gdx docs stream → quality gate → corpus anti-join → gdx sink") {
    // the full continuous-curation composition on GDX ends: documents
    // arrive as set-with-text shards, a stateless quality gate and the
    // standing-corpus anti-join filter them per micro-batch, survivors
    // land in a GDX sink — every stage is a registered operator shape
    val base = java.nio.file.Files.createTempDirectory("gdx-curate").toString
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    val enc = new GdxStreamEncoder(s"$src/shard-00000-1.gdx", "docs", SymbolType.Set, 1)
    enc.add(Array("d1"), Array.empty[Double], Some("duplicate body text"))  // corpus dup
    enc.add(Array("d2"), Array.empty[Double], Some("ok"))                   // too short
    enc.add(Array("d3"), Array.empty[Double], Some("a genuinely novel document"))
    enc.finish()
    val corpus = Seq("duplicate body text").toDF("text")
      .select(sha2(lower(trim(col("text"))), 256).as("h"))
    val q = spark.readStream.format("gdx").option("symbol", "docs").load(src)
      .filter(length(col("text")) >= 10)
      .withColumn("h", sha2(lower(trim(col("text"))), 256))
      .join(corpus, Seq("h"), "left_anti")
      .select(col("dim_1"), col("text"))
      .writeStream.format("gdx")
      .option("symbol", "kept").option("symbolType", "set")
      .option("checkpointLocation", s"$base/cp")
      .outputMode("append")
      .start(s"$base/out")
    q.processAllAvailable()
    q.stop()
    val kept = Gdx.symbol(spark, s"$base/out", "kept").collect()
      .map(r => r.getString(0) -> r.getAs[String]("text")).toMap
    assert(kept === Map("d3" -> "a genuinely novel document"),
      s"only the long novel doc may survive the pipe: $kept")
  }

  test("streaming windowed aggregate lands in the GDX sink as labeled records") {
    // the full streaming-analytics loop: event stream → watermarked
    // tumbling agg → append-mode finalized windows → GDX shards; the
    // sink then batch-reads back as a 2-dim parameter
    val base = java.nio.file.Files.createTempDirectory("gdx-agg-sink").toString
    val ms = MemoryStream[Ev](spark)
    val agg = StreamOps.tumblingCounts(ms.toDF())
      .select(col("win_start").cast("string").as("dim_1"),
        col("event_type").as("dim_2"), col("n").cast("double").as("value"))
    val q = agg.writeStream.format("gdx")
      .option("symbol", "wincount")
      .option("checkpointLocation", s"$base/cp")
      .outputMode("append")
      .start(s"$base/out")
    ms.addData(Ev(1, t(0, 10), 1, "click", 1.0), Ev(2, t(0, 40), 1, "click", 1.0),
      Ev(3, t(1, 5), 2, "view", 1.0))
    q.processAllAvailable()
    // advance the watermark past both windows so append emits them
    ms.addData(Ev(4, t(20), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = Gdx.symbol(spark, s"$base/out", "wincount").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    def us(minute: Int): String =
      (Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00").getTime * 1000L).toString
    assert(out((us(0), "click")) == 2.0, s"window 10:00 click count, got $out")
    assert(out((us(1), "view")) == 1.0, s"window 10:01 view count, got $out")
  }

  test("gdx writeStream: continuous gdx→gdx pipe lands shards + manifest, appends per epoch") {
    val base = java.nio.file.Files.createTempDirectory("gdx-pipe").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    (0 until 100).map(i => (f"a$i%03d", i.toDouble)).toDF("dim_1", "value")
      .repartition(2).write.format("gdx").mode("overwrite").option("symbol", "s").save(src)
    val q = spark.readStream.format("gdx").option("symbol", "s").load(src)
      .writeStream.format("gdx")
      .option("symbol", "s")
      .option("checkpointLocation", s"$base/cp")
      .outputMode("append")
      .start(dst)
    q.processAllAvailable()
    val first = Gdx.symbol(spark, dst, "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val srcAll = Gdx.symbol(spark, src, "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(first == srcAll && first.size == 100,
      "the streamed sink must batch-read back equal to the source")
    assert(new java.io.File(dst, "_manifest.json").isFile)
    // second epoch: a new shard arrives at the source, flows through the
    // pipe, and the sink manifest grows by append
    val enc = new GdxStreamEncoder(s"$src/shard-99999-9.gdx", "s",
      SymbolType.Parameter, 1)
    enc.add(Array("z1"), Array(1000.0), None)
    enc.finish()
    q.processAllAvailable()
    q.stop()
    val after = Gdx.symbol(spark, dst, "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after.size == 101 && after("z1") == 1000.0,
      "second epoch's rows must append to the sink dataset")
    // manifest covers every sink shard (records sum = rows written) and
    // carries no 0-record entries (empty epoch partitions emit nothing)
    val cat = Gdx.catalog(spark, dst).filter(col("name") === "s").collect()
    assert(cat.head.getAs[Long]("records") == 101L)
    val mf = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst, "_manifest.json")))
    assert(!mf.contains("\"records\":0"), s"empty shards must not publish: $mf")

    // restart from the SAME checkpoint: the recovered query must not
    // duplicate already-committed epochs, and a third arrival flows on
    val q2 = spark.readStream.format("gdx").option("symbol", "s").load(src)
      .writeStream.format("gdx")
      .option("symbol", "s")
      .option("checkpointLocation", s"$base/cp")
      .outputMode("append")
      .start(dst)
    q2.processAllAvailable()
    val enc2 = new GdxStreamEncoder(s"$src/shard-99999-10.gdx", "s",
      SymbolType.Parameter, 1)
    enc2.add(Array("z2"), Array(2000.0), None)
    enc2.finish()
    q2.processAllAvailable()
    q2.stop()
    val recovered = Gdx.symbol(spark, dst, "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(recovered.size == 102 && recovered("z2") == 2000.0,
      s"restart must resume exactly-once: ${recovered.size} rows")
    assert(Gdx.catalog(spark, dst).filter(col("name") === "s")
      .head().getAs[Long]("records") == 102L, "no duplicated epochs after recovery")
  }

  test("cdc apply: latest-wins with tombstones; out-of-order never regresses") {
    import StreamOps.{CdcRow, Change}
    val ms = MemoryStream[Change](spark)
    val name = nextName()
    val q = StreamOps.cdcApply(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    def us(ts: Timestamp): Long = ts.getTime * 1000L

    // batch 1: two keys insert
    ms.addData(Change(1, t(1), 10, "click", 1.0), Change(2, t(1), 11, "view", 2.0))
    q.processAllAvailable()
    val b1 = spark.table(name).as[CdcRow].collect().sortBy(_.user_id).toSeq
    assert(b1 == Seq(CdcRow(1, 1.0, live = true, us(t(1))),
      CdcRow(2, 2.0, live = true, us(t(1)))))

    // batch 2: u1 tombstoned; u2 receives an OLDER change (must be
    // ignored, state re-emitted unchanged); u3 is new
    ms.addData(Change(1, t(2), 12, "error", 0.0),
      Change(2, t(0), 5, "view", 9.0), Change(3, t(1), 13, "view", 7.0))
    q.processAllAvailable(); q.stop()
    val all = spark.table(name).as[CdcRow].collect().toSeq
    val afterB2 = all.diff(b1).sortBy(_.user_id)
    assert(afterB2 == Seq(
      CdcRow(1, 0.0, live = false, us(t(2))),   // delete applied
      CdcRow(2, 2.0, live = true, us(t(1))),    // old change ignored
      CdcRow(3, 7.0, live = true, us(t(1)))))   // insert applied

    // replay convergence: the same changes in reversed arrival order
    // reach the same final snapshot (the out-of-order guard's contract)
    val ms2 = MemoryStream[Change](spark)
    val name2 = nextName()
    val q2 = StreamOps.cdcApply(ms2.toDS())
      .writeStream.format("memory").queryName(name2).outputMode("append").start()
    ms2.addData(Change(1, t(2), 12, "error", 0.0),
      Change(2, t(0), 5, "view", 9.0), Change(3, t(1), 13, "view", 7.0))
    q2.processAllAvailable()
    ms2.addData(Change(1, t(1), 10, "click", 1.0), Change(2, t(1), 11, "view", 2.0))
    q2.processAllAvailable(); q2.stop()
    val finalByUser = spark.table(name2).as[CdcRow].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.last_us) }.toMap
    assert(finalByUser(1L) == CdcRow(1, 0.0, live = false, us(t(2))))
    assert(finalByUser(2L) == CdcRow(2, 2.0, live = true, us(t(1))))
    assert(finalByUser(3L) == CdcRow(3, 7.0, live = true, us(t(1))))
  }

  test("cdc apply TTL: expired key state evicts and the key re-inserts as new") {
    import StreamOps.{CdcRow, Change}
    val ms = MemoryStream[Change](spark)
    val name = nextName()
    val q = StreamOps.cdcApply(
        ms.toDS().withWatermark("ts", "0 seconds").as[Change],
        ttl = Some(java.time.Duration.ofMinutes(5)))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    def us(ts: Timestamp): Long = ts.getTime * 1000L

    // batch 1: u1 inserts; its retention clock ends at 10:05
    ms.addData(Change(1, t(0), 10, "click", 1.0))
    q.processAllAvailable()
    // batch 2: u2 advances the watermark to 10:10 (u1 not yet evicted —
    // the watermark update publishes at batch END)
    ms.addData(Change(2, t(10), 11, "view", 2.0))
    q.processAllAvailable()
    val beforeEvict = spark.table(name).count()
    // batch 3: watermark 10:10 > u1's 10:05 timeout → u1 state evicts,
    // SILENTLY (eviction emits no row); u3 inserts
    ms.addData(Change(3, t(11), 12, "view", 3.0))
    q.processAllAvailable()
    val afterB3 = spark.table(name).as[CdcRow].collect().toSeq
    assert(afterB3.size == beforeEvict + 1 &&
      afterB3.count(_.user_id == 3L) == 1,
      s"eviction must not emit rows: $afterB3")
    assert(q.lastProgress.stateOperators.head.numRowsTotal == 2,
      "u1's state row must be evicted (u2 + u3 remain) — without the TTL this is 3")
    // batch 4: u1 returns after retention → builds FRESH state and
    // emits as a new insert (the ordering guard's memory is gone)
    ms.addData(Change(1, t(20), 13, "view", 42.0))
    q.processAllAvailable(); q.stop()
    val reinserted = spark.table(name).as[CdcRow].collect()
      .filter(r => r.user_id == 1L && r.last_us == us(t(20))).toSeq
    assert(reinserted == Seq(CdcRow(1, 42.0, live = true, us(t(20)))),
      s"expired key must re-insert as new: $reinserted")
  }

  test("streaming SRM feed: exactly-once first-sight per user; cumulative parity with dq_ab_srm") {
    val dir = "/root/testdata/sf0.001"
    val evs = graft.T(spark, dir, "events").select("user_id").collect()
      .map(r => StreamOps.SrmEvent(r.getLong(0)))
    val ms = MemoryStream[StreamOps.SrmEvent](spark)
    val name = nextName()
    val q = StreamOps.srmNewUsers(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { batch =>
      ms.addData(batch.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    // replay the FIRST slice again: at-least-once delivery must emit nothing new
    ms.addData(evs.take(evs.length / 3).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    // exactly one emission per distinct user, arm = parity
    assert(emitted.length == emitted.map(_._1).distinct.length, "duplicate first-sight")
    assert(emitted.forall { case (u, t2) => t2 == (u % 2 == 0) })
    val nt = emitted.count(_._2).toLong
    val nc = emitted.length - nt
    val batchRow = graft.SparkEntry.queries("dq_ab_srm")(spark, dir).collect()(0)
    assert(batchRow.getLong(0) == nt && batchRow.getLong(1) == nc,
      s"cumulative arm counts ($nt, $nc) diverge from the batch census")
    // the chi-square the platform computes over this feed equals the batch one
    val chi2 = BigDecimal((nt - nc).toDouble * (nt - nc) / (nt + nc))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(batchRow.getDouble(2) == chi2)
  }
}
