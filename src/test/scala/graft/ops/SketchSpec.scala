package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the count-min sketch row (estimates are
  * seed/hash-dependent, so the DuckDB oracle can't check them): CMS
  * error is ONE-SIDED — an estimate never undercounts the true
  * frequency, and overcounts by at most εN with high probability
  * (Cormode & Muthukrishnan 2005). Checked against exact counts on
  * the full sf0.001 token stream.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark = graft.Sessions.build("local[4]", "4")

  private val dir = "/root/testdata/sf0.001"

  test("agg_count_min: estimates bound exact counts from above, within eps*N") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val total = toks.count()
    val rows = graft.SparkEntry.queries("agg_count_min")(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (tok, est, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS must never undercount: $tok est=$est exact=$exact")
      // query eps = 1e-4; allow 10x slack over the w.h.p. bound so the
      // test pins the contract without flaking on the 1% tail
      assert(est <= exact + math.max(1L, (0.001 * total).toLong),
        s"CMS overcount beyond bound: $tok est=$est exact=$exact N=$total")
    }
    // probes are the exact top-10: counts strictly positive, tokens distinct
    assert(rows.map(_.getString(0)).distinct.length == 10)
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("portable HLL agrees with the DataSketches built-in and the exact count") {
    // The registered agg_approx_distinct row is the md5-portable HLL
    // (hash-checked by the DuckDB oracle); the zero-code alternative a
    // Spark user reaches for is the DataSketches pair, demonstrated
    // here: build per-flag sketches, union them, estimate — both
    // estimators must land within their rsd envelopes of the exact
    // global distinct (m=4096 → rsd ≈ 1.6%, allow 4σ).
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_partkey"))).head.getLong(0).toDouble
    val builtIn = li
      .groupBy("l_returnflag")
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head.getLong(0).toDouble
    val portable = graft.SparkEntry.queries("agg_hll_partial_merge")(spark, dir)
      .head.getLong(0).toDouble
    assert(math.abs(builtIn - exact) / exact < 0.065,
      s"DataSketches union estimate $builtIn too far from exact $exact")
    assert(math.abs(portable - exact) / exact < 0.065,
      s"portable HLL merge estimate $portable too far from exact $exact")
  }

  test("portable HLL registers are merge-shape-invariant (max is order-free)") {
    // split lineitem into arbitrary halves, sketch each, max-merge →
    // identical registers (hence identical estimate) to one-shot
    val est = (parts: Int) => {
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try graft.SparkEntry.queries("agg_hll_partial_merge")(spark, dir)
        .head.getLong(0)
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    assert(est(2) == est(17), "estimate must not depend on partitioning")
  }

  test("agg_hll_intersection: partial-overlap fixture pins the inclusion-exclusion error band") {
    // the driver events table is degenerate for this op (every user does
    // both event types, so A = B = U and the estimator is never
    // stressed) — craft a 10k/10k set pair with exactly 5k overlap
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_hllix").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val views = (0L until 10000L).map(u => (u, "view", t0))
    val purchases = (5000L until 15000L).map(u => (u, "purchase", t0))
    (views ++ purchases).toDF("user_id", "event_type", "ts")
      .write.parquet(s"$dir2/events.parquet")
    val r = graft.SparkEntry.queries("agg_hll_intersection")(spark, dir2).collect()
    assert(r.length == 1)
    val (ea, eb, eu, ei, ex) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    assert(ex == 5000, s"exact companion must be 5000, got $ex")
    // single-sketch rse at m=4096 is ~1.6%; allow 3 sigma
    assert(math.abs(ea - 10000) < 500, s"est_view $ea")
    assert(math.abs(eb - 10000) < 500, s"est_purchase $eb")
    assert(math.abs(eu - 15000) < 750, s"est_union $eu")
    // the difference of three estimates compounds error — the honest
    // band is wide; a collapsed (0 or 2x) estimate still fails loudly
    assert(ei > 3500 && ei < 6500, s"est_intersection $ei strayed from 5000")
    assert(ei == ea + eb - eu, "inclusion-exclusion identity (clamped at 0)")
  }
}
