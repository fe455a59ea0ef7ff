package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** TEMPORARY r19 probe (removed before round close): run one registry
  * key and print every Spark job with its duration and originating
  * call site, so a 120-job iterative operator can be decomposed into
  * "which loop line pays how many jobs / how much wall-clock".
  *
  * usage: JobProbe <sfDir> <key>
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, key) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val agg = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '(').trim)
          .getOrElse("?") + "@" +
          j.stageInfos.lastOption.flatMap(s => s.name.split(" at ").lastOption)
            .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1000000
          agg.merge(site, (1, ms),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    })
    SparkEntry.entry(spark).count()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => T(spark, sfDir, t).count())
    Sessions.releaseCheckpoints(spark)
    // warm run, then measured run
    SparkEntry.queries(key)(spark, sfDir).count()
    Sessions.releaseCheckpoints(spark)
    agg.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(key)(spark, sfDir).count()
    val t = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    println(f"[jobprobe] $key total=$t%.3f s")
    agg.asScala.toSeq.sortBy(-_._2._2).foreach { case (site, (n, ms)) =>
      println(f"[jobprobe]   n=$n%4d  ${ms}%6d ms  $site")
    }
    spark.stop()
  }
}
