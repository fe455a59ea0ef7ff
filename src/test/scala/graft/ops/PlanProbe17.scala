package graft.ops

/** Dev-loop: dump the physical plans of the r17 keys for the scale
  * audit (broadcasts where expected, no cartesian, AQE-eligible
  * shuffles only).
  */
object PlanProbe17 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[4]", "4")
    val d = "/root/testdata/sf0.01"
    for (k <- Seq("dedup_semdedup_keep", "eval_map_at_k", "eval_ndcg_at_k")) {
      println(s"===== $k =====")
      val df = graft.SparkEntry.queries(k)(spark, d)
      println(df.queryExecution.executedPlan.treeString.linesIterator
        .map(_.take(160)).mkString("\n"))
      graft.Sessions.releaseCheckpoints(spark)
    }
  }
}
