package graft.ops

/** Dev harness: print executed plans for a list of registered queries
  * (not a test — run via `Test/runMain graft.ops.ExplainAudit q1 q2 …`).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[4]", "4")
    val d = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"\n========== $name ==========")
      val df = graft.SparkEntry.queries(name)(spark, d)
      println(df.queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
