package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness for SCALE.md §6: replicate the sf0.1 tables 10× (~sf1)
  * with key-shifted, slightly-perturbed copies (so dedup/novelty see
  * TRUE near-dup structure and joins stay honest), then time the
  * registered queries named on the command line against the replicated
  * dir. Run via `Test/runMain graft.ops.StressProbe q1 q2 …`.
  */
object StressProbe {
  private val out = "/tmp/graft_probe_sf1"

  private def build(spark: SparkSession): Unit = {
    val src = "/root/testdata/sf0.1"
    def repl(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = graft.T(spark, src, name)
      val ten = (0 until 10).map(i => f(base, i)).reduce(_ unionByName _)
      ten.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    }
    repl("documents") { (df, i) =>
      // copy i: shifted ids, one appended copy-specific token → each doc
      // has 9 true near-duplicates (Jaccard ≈ 0.97, containment ≈ 1)
      df.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" v$i")).as("text"),
        col("lang"), col("source"), (col("n_chars") + lit(3)).as("n_chars"))
    }
    repl("embeddings") { (df, i) =>
      df.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        transform(col("embedding"),
          x => (x + lit(i * 1e-3f)).cast("float")).as("embedding"),
        col("label"))
    }
    repl("events") { (df, i) =>
      // T() rebuilds events.ts from a nanos long — write it back that way
      df.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        (unix_micros(col("ts")) * lit(1000L)).as("ts"),
        (col("user_id") + lit(i * 100000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    // small dims referenced by some queries pass through unchanged
    Seq("nation", "region", "customer", "orders", "lineitem", "supplier", "part")
      .foreach { t =>
        graft.T(spark, src, t).write.mode(SaveMode.Overwrite)
          .parquet(s"$out/$t.parquet")
      }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[32]", "32")
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      println("[probe] building 10x replicated tables …")
      build(spark)
    }
    args.foreach { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, out).count()
        graft.Sessions.releaseCheckpoints(spark)
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"[probe] $name%-28s min=${times.map(_._1).min}%8.2f s  rows=${times.head._2}")
    }
    spark.stop()
  }
}
