package graft.ops

import graft.{QueryModule, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.E (window functions) + §2.F (sorts/limits/top-k).
  *
  * All window orderings carry a unique tiebreak column (event_id /
  * p_partkey / c_custkey) so frames are deterministic for the hash oracle.
  * Scale: windows shuffle once on their partition key; the global windows
  * (ntile over customers) are documented as driver-bounded demo shapes —
  * at 100 TB you'd pre-bucket by range instead.
  */
object WindowOps extends QueryModule {

  // ---------------------------------------------------------------- E

  q("win_rank_topk_per_group",
    """SELECT p_brand, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      |  FROM part) t WHERE rn <= 3 ORDER BY p_brand, p_partkey""") { (s, d) =>
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    T(s, d, "part")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "p_partkey")
  }

  // Same result as win_rank_topk_per_group, computed with the bounded
  // TopKAgg Aggregator instead of a window: the shuffle carries at most
  // k rows per group (map-side partial top-k) and nothing sorts whole
  // partitions — the 100 TB formulation. Identical DuckDB oracle.
  q("topk_per_group_agg",
    """SELECT p_brand, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      |  FROM part) t WHERE rn <= 3 ORDER BY p_brand, p_partkey""") { (s, d) =>
    import graft.functions.{TopKAgg, TopKEntry}
    import s.implicits._
    val topk = udaf(TopKAgg(3))
    T(s, d, "part")
      .groupBy("p_brand")
      .agg(topk(col("p_retailprice"), col("p_partkey")).as("top"))
      .select(col("p_brand"), explode(col("top.items")).as("e"))
      .select(col("p_brand"), col("e.id").as("p_partkey"), col("e.value").as("p_retailprice"))
      .orderBy("p_brand", "p_partkey")
  }

  // pointwise subtraction of identical doubles is bitwise deterministic —
  // no rounding (rounding would ADD half-boundary risk, not remove it)
  q("win_lag_delta",
    """SELECT event_id,
      |       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
      |FROM events ORDER BY event_id""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    T(s, d, "events")
      .select(col("event_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"))
      .orderBy("event_id")
  }

  q("win_moving_avg",
    """SELECT event_id,
      |       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS mov_avg
      |FROM events ORDER BY event_id""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-6, 0)
    T(s, d, "events")
      .select(col("event_id"), round(avg(col("value")).over(w), 6).as("mov_avg"))
      .orderBy("event_id")
  }

  q("win_range_frame",
    """SELECT event_id,
      |       round(sum(value) OVER (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS sum_1h
      |FROM events ORDER BY event_id""") { (s, d) =>
    val e = T(s, d, "events")
      .withColumn("sec", (unix_micros(col("ts")) / lit(1000000L)).cast("long"))
    val w = Window.partitionBy("user_id").orderBy(col("sec").asc)
      .rangeBetween(-3600, 0)
    e.select(col("event_id"), round(sum(col("value")).over(w), 4).as("sum_1h"))
      .orderBy("event_id")
  }

  q("win_cume",
    """SELECT event_id,
      |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cume
      |FROM events ORDER BY event_id""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    T(s, d, "events")
      .select(col("event_id"), round(sum(col("value")).over(w), 4).as("cume"))
      .orderBy("event_id")
  }

  q("win_ntile_percent",
    """SELECT c_custkey,
      |       ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS bucket,
      |       round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pr
      |FROM customer ORDER BY c_custkey""") { (s, d) =>
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    T(s, d, "customer")
      .select(col("c_custkey"), ntile(4).over(w).as("bucket"),
        round(percent_rank().over(w), 6).as("pr"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- F

  q("sort_by_key",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity") {
    (s, d) =>
      T(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
  }

  q("limit_n",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100") { (s, d) =>
    T(s, d, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
      .limit(100)
      .orderBy("o_orderkey") // re-sort after limit so the written order is total
  }

  // orderBy+limit plans as TakeOrderedAndProject — no full global sort.
  q("topk_global",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10") {
    (s, d) =>
      T(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
  }
}
