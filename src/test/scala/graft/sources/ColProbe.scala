package graft.sources
object ColProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[4]", "4")
    val dir = java.nio.file.Files.createTempDirectory("colprobe").toString
    spark.range(2000000L).select(
      org.apache.spark.sql.functions.format_string("k%08d", org.apache.spark.sql.functions.col("id")).as("dim_1"),
      org.apache.spark.sql.functions.col("id").cast("double").as("value"))
      .repartition(4)
      .write.format("gdx").mode("overwrite").option("symbol", "s").save(dir)
    def timed(label: String, vec: Boolean): Double = {
      val df = spark.read.format("gdx").option("symbol", "s")
        .option("vectorized", vec.toString).load(dir)
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        df.agg(org.apache.spark.sql.functions.sum("value")).head.getDouble(0)
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[$label] best ${2000000 / best / 1e6}%.2f M rec/s ($best%.2f s)")
      best
    }
    val r = timed("row      ", vec = false)
    val c = timed("columnar ", vec = true)
    println(f"[speedup] ${r / c}%.2fx")
    spark.stop()
  }
}
