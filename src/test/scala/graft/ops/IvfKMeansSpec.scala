package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contract of the Lloyd-trained IVF quantizer
  * (sim_ann_ivf_trained is rows-only checked because double-mean order
  * makes centroids ulp-nondeterministic — so the properties that make
  * the training loop correct are pinned here instead):
  * Lloyd's iterations must not increase quantization error, training
  * must beat the first-K seeding it starts from, and the search shape
  * must stay a real partition of the corpus.
  */
class IvfKMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.build("local[4]", "4")

  private val d = "/root/testdata/sf0.01"
  private def emb = graft.T(spark, d, "embeddings").select("vec_id", "embedding")

  test("quantization error is monotone non-increasing over Lloyd iterations") {
    val errs = (0 to 3).map { it =>
      ivfQuantErrTol(LlmOps.kmeansCentroids(emb, k = 8, iters = it))
    }
    errs.sliding(2).foreach { case Seq(prev, next) =>
      // float-cast centroids + double means: allow 1e-6 slack, the
      // mathematical guarantee is on the exact means
      assert(next <= prev + 1e-6, s"SSE increased across an iteration: $errs")
    }
    assert(errs.last < errs.head,
      s"two Lloyd iterations should strictly improve on first-K seeding: $errs")
  }

  private def ivfQuantErrTol(c: Array[Array[Float]]): Double =
    LlmOps.ivfQuantError(emb, c)

  test("trained cells form a genuine partition with multiple non-empty cells") {
    val cents = LlmOps.kmeansCentroids(emb, k = 8, iters = 2)
    val cells = graft.SparkEntry.queries("sim_ann_ivf_trained")(spark, d)
    assert(cells.count() > 0)
    val used = emb
      .withColumn("cell", element_at(
        sort_array(array(cents.zipWithIndex.toIndexedSeq.map { case (cv, i) =>
          struct(graft.functions.vec.cosine(col("embedding"),
            array(cv.toIndexedSeq.map(x => lit(x.toDouble)): _*)).as("cos"),
            lit(i).as("cell"))
        }: _*), asc = false), 1).getField("cell"))
      .select(countDistinct("cell")).head.getLong(0)
    assert(used >= 4, s"k-means collapsed to $used cells")
  }
}
