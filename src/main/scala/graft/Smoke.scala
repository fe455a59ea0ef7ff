package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's smoke check: runs SparkEntry.entry
  * on sf0.001 and prints the row count (must be > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[4]", "4")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry() rows = $n")
    spark.stop()
  }
}
