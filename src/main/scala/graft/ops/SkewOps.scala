package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key mitigation beyond AQE (SURVEY §2.C notes, SCALE.md §4):
  * explicit salting for the case AQE's skew-join split can't fix —
  * a single join key so hot that one task would still own it after
  * splitting, e.g. a degenerate UEL or a header-value key.
  *
  * `saltedJoin(big, small, key, n)` is semantically an inner equi-join
  * on `key`: the big (skewed) side scatters each row to one of n salt
  * buckets, the small side replicates each row to all n — so the hot
  * key's work lands on n tasks instead of one. Replication multiplies
  * the small side by n; choose n ≈ skew factor, keep small small.
  */
object SkewOps {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalt: Int): DataFrame = {
    require(nSalt > 0, "nSalt must be positive")
    // deterministic scatter: hash of the whole big-side row spreads even
    // a single hot key uniformly; any per-row expression works
    val bigSalted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(nSalt)))
    val smallExploded = small.withColumn("__salt",
      explode(array((0 until nSalt).map(lit): _*)))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }
}
