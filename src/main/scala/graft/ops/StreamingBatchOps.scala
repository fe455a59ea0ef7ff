package graft.ops

import graft.{QueryModule, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.J — batch-mode equivalents of the streaming operators
  * (the `queries` signature is batch). The actual Structured Streaming
  * execution (watermarks, MemoryStream, state) lives in
  * graft.streaming.StreamOps and its ScalaTest suite; each batch query
  * here computes the same result the streaming pipeline converges to,
  * which is exactly what batch/stream parity tests assert.
  */
object StreamingBatchOps extends QueryModule {

  q("stream_tumbling_count",
    """SELECT CAST(epoch_us(date_trunc('minute', ts)) AS BIGINT) AS win_start, event_type,
      |       count(*) AS n
      |FROM events GROUP BY win_start, event_type ORDER BY win_start, event_type""") { (s, d) =>
    T(s, d, "events")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type")
  }

  q("stream_sliding_avg",
    """SELECT CAST((m - i) * 60000000 AS BIGINT) AS win_start, count(*) AS n,
      |       round(avg(v), 6) AS av
      |FROM (SELECT epoch_us(date_trunc('minute', ts)) // 60000000 AS m, value AS v FROM events) e,
      |     range(5) r(i)
      |GROUP BY win_start ORDER BY win_start""") { (s, d) =>
    T(s, d, "events")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("av"))
      .select(unix_micros(col("window.start")).as("win_start"), col("n"), col("av"))
      .orderBy("win_start")
  }

  /** Windowed top-k: the 2 busiest event types per 5-minute tumbling
    * window — the "trending now" stream shape. Batch form: window
    * counts + per-window rank, which Spark plans as WindowGroupLimit
    * (map tasks keep local top-k per window before the shuffle). The
    * streaming form runs the count aggregate incrementally and ranks
    * per finalized window downstream (rank itself is not an
    * incremental operator — StreamingSpec pins count-state parity).
    */
  q("stream_windowed_topk",
    """WITH wc AS (
      |  SELECT epoch_us(ts) // 300000000 * 300000000 AS win_start, event_type,
      |         count(*) AS n
      |  FROM events GROUP BY win_start, event_type)
      |SELECT CAST(win_start AS BIGINT) AS win_start, event_type, n,
      |       CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT win_start, event_type, n,
      |         row_number() OVER (PARTITION BY win_start ORDER BY n DESC, event_type) AS rk
      |  FROM wc) t
      |WHERE rk <= 2 ORDER BY win_start, rk""") { (s, d) =>
    val w = Window.partitionBy("win_start").orderBy(col("n").desc, col("event_type").asc)
    T(s, d, "events")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start"), col("event_type"), col("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .orderBy("win_start", "rk")
  }

  // Session windows (30-min gap) as batch gaps-and-islands; >= matches
  // Spark session_window merge semantics (gap strictly < 30 min merges).
  q("stream_session",
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |     y AS (
      |  SELECT user_id, ts,
      |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM x)
      |SELECT user_id, sid, CAST(epoch_us(min(ts)) AS BIGINT) AS session_start, count(*) AS n
      |FROM y GROUP BY user_id, sid ORDER BY user_id, sid""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = 30L * 60 * 1000000
    T(s, d, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >= gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(unix_micros(min(col("ts"))).as("session_start"), count(lit(1)).as("n"))
      .orderBy("user_id", "sid") // one row per session = input-sized
  }

  // Final-watermark filter: the batch fixpoint of a 10-min watermark is
  // "events no older than max(ts) - 10 min survive the state cutoff".
  q("stream_watermark_late",
    """SELECT event_type, count(*) AS n FROM events
      |WHERE ts >= (SELECT max(ts) - INTERVAL 10 MINUTE FROM events)
      |GROUP BY event_type ORDER BY event_type""") { (s, d) =>
    val e = T(s, d, "events")
    val cutoff = e.agg((max(unix_micros(col("ts"))) - 10L * 60 * 1000000).as("cut"))
    e.crossJoin(broadcast(cutoff))
      .filter(unix_micros(col("ts")) >= col("cut"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .reportSorted("event_type")
  }

  q("stream_dedup",
    """SELECT count(*) AS n FROM (
      |  SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS m FROM events) t""") {
    (s, d) =>
      T(s, d, "events")
        .select(col("user_id"), col("event_type"), date_trunc("minute", col("ts")).as("m"))
        .dropDuplicates()
        .agg(count(lit(1)).as("n"))
  }

  // Funnel: users whose first view < first click < first purchase —
  // batch shape of the per-user custom-state streaming operator.
  q("stream_stateful_custom",
    """WITH f AS (SELECT user_id,
      |                  min(CASE WHEN event_type = 'view' THEN ts END) AS vt,
      |                  min(CASE WHEN event_type = 'click' THEN ts END) AS ct,
      |                  min(CASE WHEN event_type = 'purchase' THEN ts END) AS pt
      |           FROM events GROUP BY user_id)
      |SELECT user_id FROM f
      |WHERE vt IS NOT NULL AND ct IS NOT NULL AND pt IS NOT NULL AND vt < ct AND ct < pt
      |ORDER BY user_id""") { (s, d) =>
    T(s, d, "events")
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("vt"),
        min(when(col("event_type") === "click", col("ts"))).as("ct"),
        min(when(col("event_type") === "purchase", col("ts"))).as("pt"))
      .filter(col("vt").isNotNull && col("ct").isNotNull && col("pt").isNotNull &&
        col("vt") < col("ct") && col("ct") < col("pt"))
      .select("user_id")
      .orderBy("user_id") // one row per qualifying user = input-sized
  }

  // Stream-static enrichment: the arriving event stream joins a slowly
  // changing dimension (customer) that is BROADCAST per micro-batch —
  // Structured Streaming's standard enrichment shape, stateless, no
  // stream-side shuffle. Batch fixpoint below; the streaming execution
  // (MemoryStream joined to the static frame) is parity-tested in
  // StreamingSpec.
  q("stream_static_enrich",
    """SELECT c.c_mktsegment, e.event_type, count(*) AS n,
      |       round(CAST(sum(e.value) AS DOUBLE), 4) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    T(s, d, "events")
      .join(broadcast(T(s, d, "customer").select("c_custkey", "c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value").cast("double"), 4).as("sum_value"))
      .reportSorted("c_mktsegment", "event_type")
  }

  // Stream-stream interval join: click→purchase attribution within a
  // 10-minute window per user — the canonical watermarked stream-stream
  // join (state bounded by the interval). Batch fixpoint: equi-join on
  // user_id + time-range predicate; the watermarked two-MemoryStream
  // execution is parity-tested in StreamingSpec.
  q("stream_stream_join",
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
      |ORDER BY click_id, purchase_id""") { (s, d) =>
    val e = T(s, d, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    clicks.join(purchases,
      col("user_id") === col("p_uid") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("interval 10 minutes"))
      .select("click_id", "purchase_id")
      .orderBy("click_id", "purchase_id") // attribution pairs = input-sized
  }
}
