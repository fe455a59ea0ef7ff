package graft
import org.apache.spark.sql.functions._

/** TEMPORARY r18 probe: does a localCheckpoint of a repartition(col)
  * frame keep its outputPartitioning, and does a subsequent src-keyed
  * join skip the exchange on that side?
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[8]", "8")
    import spark.implicits._
    val e = (1 to 10000).map(i => (i.toLong % 500, (i * 7).toLong % 500))
      .toDF("src", "dst")
    val sym = e.repartition(col("src")).localCheckpoint()
    val labels = (0L until 500L).map(i => (i, i)).toDF("id", "lbl")
    val j = sym.join(labels.select(col("id").as("src"), col("lbl")), Seq("src"))
      .groupBy("dst").agg(min("lbl").as("m"))
    println("[partprobe] plan:")
    println(j.queryExecution.executedPlan.toString.take(4000))
    j.count()
  }
}
