package graft
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY r18 probe: does Observation fire on localCheckpoint()? */
object ObsTest {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[4]", "4")
    import spark.implicits._
    val df = (1 to 1000).toDF("x").withColumn("y", col("x") % 7)
    val obs = Observation("probe")
    val out = df.groupBy("y").agg(count(lit(1)).as("c"))
      .observe(obs, sum(col("c")).as("s"), count(lit(1)).as("n"))
      .localCheckpoint()
    // if metrics never fire, get blocks: bound the wait with a future
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val got = try Await.result(Future(obs.get), 10.seconds).toString
      catch { case _: java.util.concurrent.TimeoutException => "TIMEOUT" }
    println(s"[obstest] metrics after localCheckpoint = $got")
    println(s"[obstest] rows = ${out.count()}")
    spark.stop()
  }
}
