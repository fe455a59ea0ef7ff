package graft.ops
/** Local plan-inspection probe (test scope, not part of the library). */
object PlanProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[4]", "4")
    val name = args(0)
    // optional trailing key=value args: session-conf overrides, e.g.
    // spark.sql.autoBroadcastJoinThreshold=-1 to preview the at-scale
    // (sort-merge) physical plan that AQE's local broadcasts would mask
    args.drop(1).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
  }
}
