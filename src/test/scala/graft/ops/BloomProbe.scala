package graft.ops
import org.apache.spark.sql.functions._
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[4]", "4")
    println("runtime bloom conf: " + spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    try {
      val df = spark.range(100).selectExpr("bloom_filter_agg(id, 100, 800) as bf")
      val bf = df.collect()(0)
      println("bloom_filter_agg OK, bytes=" + bf.getAs[Array[Byte]](0).length)
      spark.range(100).crossJoin(df).selectExpr("count(case when might_contain(bf, id) then 1 end) as hits").show()
    } catch { case e: Throwable => println("bloom fns unavailable: " + e.getMessage.take(200)) }
    // does Spark inject a runtime bloom filter on a selective dim join?
    val d = "/root/testdata/sf0.01"
    val fact = graft.T(spark, d, "lineitem")
    val dim = graft.T(spark, d, "part").filter(col("p_retailprice") > 1990)
    val j = fact.join(dim, col("l_partkey") === col("p_partkey")).groupBy("p_brand").count()
    val plan = j.queryExecution.optimizedPlan.toString
    println("BloomFilter in optimized plan: " + plan.contains("bloom"))
  }
}
