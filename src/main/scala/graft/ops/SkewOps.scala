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
object SkewOps extends graft.QueryModule {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalt: Int): DataFrame = {
    require(nSalt > 0, "nSalt must be positive")
    // deterministic scatter: hash of the whole big-side row spreads even
    // a single hot key uniformly; any per-row expression works
    val bigSalted = big.withColumn("__salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(nSalt)))
    val smallExploded = small.withColumn("__salt",
      explode(array((0 until nSalt).map(lit): _*)))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }

  // Salting is semantically transparent, so the oracle is the PLAIN
  // join — the hash-match proves exactly that (same rows with or
  // without the salt scatter), which is the whole point of the utility.
  q("join_skew_salted",
    """SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE o.o_orderkey % 100 = 0
      |ORDER BY o_orderkey, o_custkey, c_mktsegment""") { (s, d) =>
    import graft.T
    val big = T(s, d, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val small = T(s, d, "customer").select("c_custkey", "c_mktsegment")
    saltedJoin(big, small, "c_custkey", nSalt = 8)
      .select(col("o_orderkey"), col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      .orderBy("o_orderkey", "o_custkey", "c_mktsegment") // row-per-order = input-sized
  }
}
