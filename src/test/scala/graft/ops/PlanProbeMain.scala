package graft.ops
/** Local plan-inspection probe (test scope, not part of the library). */
object PlanProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[4]", "4")
    val name = args(0)
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
  }
}
