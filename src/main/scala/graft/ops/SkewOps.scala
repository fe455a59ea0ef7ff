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
  //
  // The example exercises the pattern in its intended shape: the BIG
  // side is customer joining on c_nationkey, a 25-value key where
  // every value is hot by construction (|customer|/25 rows each — the
  // degenerate low-cardinality key AQE's split can't always separate),
  // and the replicated side is nation, a FIXED 25-row dim (8× salt =
  // 200 rows of replication — "keep small small" honored; replicating
  // a data-sized side would multiply shuffle volume for nothing).
  q("join_skew_salted",
    """SELECT c.c_custkey, n.n_name
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |ORDER BY c_custkey""") { (s, d) =>
    import graft.T
    val big = T(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("n_nationkey"))
    // hint("merge") pins the shuffle-join shape the pattern exists
    // for — in production the salted side is too big to broadcast by
    // definition (a broadcastable side needs no salt), but the 25-row
    // demo dim would otherwise auto-broadcast and execute the salt as
    // a no-op
    val small = T(s, d, "nation").select("n_nationkey", "n_name").hint("merge")
    saltedJoin(big, small, "n_nationkey", nSalt = 8)
      .select(col("c_custkey"), col("n_name"))
      .orderBy("c_custkey") // row-per-customer = input-sized
  }
}
