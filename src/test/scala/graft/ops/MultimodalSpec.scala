package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema/batch shape of the mapPartitions feature
  * extractor, determinism of the fake decode, and frame-sample counts.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.build("local[4]", "4")

  private val dir = "/root/testdata/sf0.001"

  test("media table carries binary payload + typed metadata struct") {
    val m = MultimodalOps.mediaTable(spark, dir)
    val f = m.schema("payload").dataType.typeName
    assert(f == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    assert(m.filter(col("meta.width") <= 0 || col("meta.n_frames") <= 0).count() == 0)
  }

  test("feature extraction: fixed dim, partition-preserving, deterministic") {
    val m = MultimodalOps.mediaTable(spark, dir).repartition(3)
    val feats = MultimodalOps.extractFeatures(m, dim = 16, batchSize = 8)
    assert(feats.rdd.getNumPartitions == 3) // no shuffle introduced
    assert(feats.filter(size(col("features")) =!= 16).count() == 0)
    val a = feats.orderBy("doc_id").collect().map(_.getSeq[Float](1))
    val b = MultimodalOps.extractFeatures(m, dim = 16, batchSize = 3)
      .orderBy("doc_id").collect().map(_.getSeq[Float](1))
    // batch size must not change results — pure per-row function
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("fakeEmbed folds all bytes and is length-sensitive") {
    val e1 = MultimodalOps.fakeEmbed("abcabc".getBytes("UTF-8"), 4)
    val e2 = MultimodalOps.fakeEmbed("abcabcx".getBytes("UTF-8"), 4)
    assert(e1.toSeq != e2.toSeq)
    assert(e1.sum > 0f)
  }

  test("frame sampling emits ceil(n_frames/5) frames per video") {
    val m = MultimodalOps.mediaTable(spark, dir).filter(col("meta.kind") === "video")
    val sampled = SparkEntryAccess.query("mm_frame_sample")(spark, dir)
    val perDoc = sampled.groupBy("doc_id").count()
    val expected = m.select(col("doc_id"),
      ceil(col("meta.n_frames").cast("double") / 5).cast("long").as("exp"))
    assert(perDoc.join(expected, "doc_id")
      .filter(col("count") =!= col("exp")).count() == 0)
  }
}

/** Test access to the registered query map without duplicating wiring. */
object SparkEntryAccess {
  def query(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries(name)
}
