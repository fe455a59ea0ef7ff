package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximation contract of the LSH-bucketed near-dup path
  * (dedup_embedding_cosine): candidates come only from shared buckets,
  * the exact cosine filter then runs on every candidate — so precision
  * must be exactly 1.0 (every emitted pair is a true pair) and recall
  * is the knowingly-traded quantity (measured here against the
  * brute-force cross join on the small correctness tier).
  */
class LshRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.build("local[4]", "4")

  private val d = "/root/testdata/sf0.01"
  private val thr = 0.45

  test("LSH pairs are a subset of brute-force pairs (precision 1.0), recall measured") {
    val emb = graft.T(spark, d, "embeddings").select("vec_id", "embedding")
    val bf = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") < col("b"))
      .withColumn("cos", round(graft.functions.vec.cosine(col("ea"), col("eb")), 6))
      .filter(col("cos") >= thr)
      .select("a", "b")
    val lsh = SparkEntryQueries.embeddingCosine(spark, d).select("a", "b")

    val truth = bf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(found.subsetOf(truth), s"false positives: ${found -- truth}")
    assert(truth.nonEmpty)
    val recall = found.size.toDouble / truth.size
    // at the synthetic 0.45 threshold (θ≈63°) single-table 6-plane LSH
    // recalls ~(1-63/180)^6 ≈ 9% per pair plus sign-correlation; the
    // observed value on this data is ~0.29 — assert a conservative floor
    // so a silent bucketing regression (e.g. a broken plane) fails here
    assert(recall >= 0.15, s"recall collapsed: $recall")
  }
}

/** Test access to the registered query body without going through the
  * full SparkEntry map (keeps the spec focused on one operator).
  */
private object SparkEntryQueries {
  def embeddingCosine(s: SparkSession, d: String) =
    graft.SparkEntry.queries("dedup_embedding_cosine")(s, d)
}
