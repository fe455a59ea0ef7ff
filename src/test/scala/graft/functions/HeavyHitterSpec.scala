package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries `mg_topk` — the two sketch guarantees (Misra & Gries
  * 1982; Agarwal et al. 2013 mergeable summaries), asserted under real
  * partitioned execution so the partial/merge path is what's tested.
  */
class HeavyHitterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.build("local[4]", "4")

  private def hitters(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] = {
    import org.apache.spark.sql.Row
    df.agg(agg.mgTopK(col("w"), k).as("hh")).head.getSeq[Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("every item with frequency > n/k is found, counts are valid lower bounds") {
    import spark.implicits._
    // 10_000 rows: "hot" 4000×, "warm" 2000×, the rest unique noise
    val rows = Seq.fill(4000)("hot") ++ Seq.fill(2000)("warm") ++
      (0 until 4000).map(i => s"noise$i")
    val df = rows.toDF("w").repartition(8) // force the merge path
    val n = rows.size.toLong
    val k = 8
    val hh = hitters(df, k)
    // guarantee 1: true count > n/k = 1250 ⇒ present
    assert(hh.contains("hot") && hh.contains("warm"), s"lost a heavy hitter: $hh")
    // guarantee 2: reported counts are lower bounds, short by ≤ n/k
    assert(hh("hot") <= 4000 && hh("hot") >= 4000 - n / k, s"hot count ${hh("hot")}")
    assert(hh("warm") <= 2000 && hh("warm") >= 2000 - n / k, s"warm count ${hh("warm")}")
    // state bound: never more than k−1 counters survive
    assert(hh.size <= k - 1)
  }

  test("sketch state stays k-bounded and correct regardless of partitioning") {
    import spark.implicits._
    val rows = Seq.fill(900)("a") ++ Seq.fill(500)("b") ++
      (0 until 600).map(i => s"x$i")
    for (parts <- Seq(1, 3, 13)) {
      val hh = hitters(rows.toDF("w").repartition(parts), 4)
      assert(hh.contains("a"), s"parts=$parts lost 'a': $hh") // 900 > 2000/4
      assert(hh.size <= 3, s"parts=$parts overflowed: $hh")
      hh.foreach { case (_, c) => assert(c > 0) }
    }
  }

  test("resolves from SQL through the extension registry") {
    import spark.implicits._
    Seq("p", "p", "p", "q").toDF("w").createOrReplaceTempView("hh_in")
    val out = spark.sql("SELECT mg_topk(w, 3) AS hh FROM hh_in").head.getSeq[Any](0)
    assert(out.nonEmpty)
  }

  test("null inputs are skipped, not counted") {
    import spark.implicits._
    val df = Seq(Some("z"), None, Some("z"), None).toDF("w")
    val hh = hitters(df, 4)
    assert(hh == Map("z" -> 2L))
  }

  test("two-pass registry rows are partitioning-invariant (exact verify makes MG deterministic)") {
    // the CANDIDATE set from merged MG buffers is merge-order-dependent;
    // the registered rows filter candidates by exact counts, so the
    // output must be the true {freq > n/64} set under any partitioning
    val dir = "/root/testdata/sf0.001"
    def run(name: String, parts: String) = {
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toSeq)
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    Seq("agg_heavy_hitters", "agg_heavy_hitters_grouped").foreach { q =>
      val a = run(q, "2")
      assert(a.nonEmpty, s"$q returned no heavy hitters")
      assert(a == run(q, "17"), s"$q output depends on partitioning")
    }
  }
}
