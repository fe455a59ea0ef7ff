package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** TEMPORARY r18 measurement harness (not part of the driver contract;
  * removed before round close). Times registry keys under an
  * experimental session config and counts jobs/stages/tasks, so config
  * and plan hypotheses are measured, not guessed.
  *
  * usage: OptProbe <sfDir> <regex> <reps> [k=v ...]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val re = args(1).r
    val reps = args(2).toInt
    val confs = args.drop(3).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    // warmup as in Bench
    SparkEntry.entry(spark).count()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => T(spark, sfDir, t).count())
    // probe.mode=plan times ONLY DataFrame construction + physical
    // planning (queryExecution.executedPlan), skipping the action —
    // decomposes a key's per-rep cost into "driver planning" vs
    // "execution". NOTE: iterative operators run internal actions
    // during construction, so their "plan" time includes those rounds.
    val planOnly = confs.exists(kv => kv._1 == "probe.mode" && kv._2 == "plan")
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => re.pattern.matcher(n).matches() }
    sel.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        jobs = 0; stages = 0; tasks = 0
        val t0 = System.nanoTime()
        if (planOnly) fn(spark, sfDir).queryExecution.executedPlan
        else fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        Sessions.releaseCheckpoints(spark)
        (t, jobs, stages, tasks)
      }
      val best = times.minBy(_._1)
      println(f"[probe] $name%-28s min=${best._1}%7.3f jobs=${best._2}%4d " +
        f"stages=${best._3}%4d tasks=${best._4}%5d all=${times.map(t => f"${t._1}%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
