package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession: UTC, fixed shuffle
  * partitions, and the GraftExtensions function injection (native
  * vector expressions). Every main and spec goes through here so the
  * registered SQL surface is identical everywhere.
  */
object Sessions {
  def build(master: String, shufflePartitions: String): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
