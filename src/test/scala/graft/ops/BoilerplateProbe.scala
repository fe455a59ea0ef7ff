package graft.ops

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness for SCALE.md: the adversarial boilerplate corpus for the
  * exact-Jaccard pair generator — N docs that ALL share one boilerplate
  * 4-token prefix (so its two 3-shingles have df = N), each followed by
  * unique filler, plus a 1% sprinkling of TRUE duplicate pairs
  * (identical text → identical minhash signatures, so they band-collide
  * with certainty and must be clustered).
  *
  * Reports:
  *   - Σ df·(df−1)/2 over ALL shingles  = candidate pairs an UNCAPPED
  *     inverted-index self-join would emit (≈ N² from the boilerplate);
  *   - the ACTUAL banded-LSH candidate count the registered generator
  *     emits (bounded by band-signature collisions — the boilerplate
  *     shingles move no pair unless a whole 3-row band matches);
  *   - wall time + cluster count of the registered
  *     `dedup_cluster_canonical` on the corpus, and a recall check that
  *     every planted duplicate pair lands in one cluster.
  *
  * Run via `Test/runMain graft.ops.BoilerplateProbe [nDocs]`.
  */
object BoilerplateProbe {
  private val out = "/tmp/graft_probe_boiler"

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark: SparkSession = graft.Sessions.build("local[32]", "32")
    import spark.implicits._

    // every doc: shared 4-token boilerplate prefix + 20 unique tokens;
    // docs with doc_id % 100 == 1 duplicate their predecessor exactly
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("terms of service apply "),
        concat_ws(" ", (0 until 20).map(j =>
          // dup pairs (i, i+1) at i % 100 == 0 share ALL filler tokens
          concat(lit(s"u${j}x"), (col("id") - when(col("id") % 100 === 1, 1)
            .otherwise(0)) * 31 + j)): _*)).as("text"),
      lit("en").as("lang"), lit("src0").as("source"))
      .withColumn("n_chars", length(col("text")))
    docs.write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    // postings (doc, 3-shingle) — same shape as jaccardPairs
    val sh = graft.T(spark, out, "documents")
      .withColumn("tok", split(col("text"), " "))
      .withColumn("shs", expr(
        "transform(sequence(0, greatest(size(tok) - 3, 0)), i -> concat_ws(' ', slice(tok, i + 1, 3)))"))
      .select(col("doc_id"), explode(expr("transform(shs, x -> xxhash64(x))")).as("shingle"))
      .distinct()
    val dfTab = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val uncapped = dfTab.select(sum(col("df") * (col("df") - 1) / 2).as("u"))
      .as[Double].collect().head
    val banded = graft.ops.LlmOps
      .minhashPairsOf(graft.T(spark, out, "documents").select("doc_id", "text"))
      .count()
    println(f"[probe] docs=$n%d uncapped_cand=$uncapped%.3g banded_cand=$banded%d")

    val t0 = System.nanoTime()
    val comp = graft.SparkEntry.queries("dedup_cluster_canonical")(spark, out)
    val rows = comp.collect()
    graft.Sessions.releaseCheckpoints(spark)
    val secs = (System.nanoTime() - t0) / 1e9
    // recall: every planted pair (i, i+1), i % 100 == 0, must be clustered
    val lbl = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = (0L until n by 100).filter(_ + 1 < n)
    val hit = planted.count(i => lbl.get(i).exists(c => lbl.get(i + 1).contains(c)))
    println(f"[probe] dedup_cluster_canonical: ${rows.length}%d clustered rows " +
      f"in $secs%.2f s; planted-pair recall $hit%d/${planted.size}%d")
    spark.stop()
  }
}
