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
}
