package graft.ops

import graft.{QueryModule, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** SURVEY.md §2.L — LLM-data-pipeline extensions over `documents` and
  * `embeddings` (exact/near dedup, similarity search, text analysis).
  *
  * Scale stance: every operator here is a pure shuffle-bounded DataFrame
  * pipeline — no driver-side loops, no collect. The near-dup and ANN
  * paths use LSH-style bucketing (banded minhash / random hyperplane
  * signs) so candidate generation is an equi-join on bucket keys rather
  * than a cross join; the brute-force variants exist as correctness
  * baselines and are documented as small-side-only.
  */
object LlmOps extends QueryModule {

  // -------------------------------------------------------- exact dedup

  q("dedup_exact",
    "SELECT min(doc_id) AS doc_id FROM documents GROUP BY lower(trim(text)) ORDER BY doc_id") {
    (s, d) =>
      // hash-groupBy: group on a 256-bit content hash (collision-safe at
      // 100 TB, tiny shuffle keys), keep lowest doc_id per group
      T(s, d, "documents")
        .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
        .orderBy("doc_id") // one row per distinct doc = input-sized
  }

  /** Canonicalize-then-exact dedup: aggressive text normalization
    * (lowercase, every non-alphanumeric run → one space, trim) before
    * the content-hash groupBy — the cheap fuzzy-exact tier every
    * production pipeline runs between byte-exact and MinHash dedup
    * (SPEC: C4/Gopher pre-dedup normalization; Lee et al. 2021 §3.1's
    * "exact" tier is normalized-exact). Catches case/punctuation/
    * whitespace mutations of the same content at exact-dedup cost: the
    * normalize is per-row map work, the groupBy shuffles one 128-bit
    * digest per doc (uniform keys, no skew), and the map-back join is
    * co-partitioned on that same digest — 100 TB shape identical to
    * dedup_exact. Output: every doc mapped to its group's canonical
    * (min) doc_id plus the group size.
    */
  q("dedup_exact_normalized",
    """WITH n AS (SELECT doc_id,
      |             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS h
      |           FROM documents),
      |g AS (SELECT h, min(doc_id) AS canonical_id, count(*) AS group_size
      |      FROM n GROUP BY h)
      |SELECT n.doc_id, g.canonical_id, CAST(g.group_size AS BIGINT) AS group_size
      |FROM n JOIN g USING (h) ORDER BY doc_id""") { (s, d) =>
    // Spark regexp_replace is global by default; DuckDB needs the 'g'
    // flag — the oracle carries it so both normalize identically
    val n = T(s, d, "documents").select(col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))).as("h"))
    val g = n.groupBy("h").agg(min("doc_id").as("canonical_id"),
      count(lit(1)).as("group_size"))
    n.join(g, Seq("h"))
      .select(col("doc_id"), col("canonical_id"), col("group_size"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  // -------------------------------------------------------- near dedup

  /** MinHash + banded LSH near-dup candidates.
    * tokenize → 3-token shingles → k=12 minhashes → 4 bands of 3 →
    * band-bucket equi-join → emit candidate pairs (a<b).
    * No cross join: pair generation is a self-equi-join on (band, sig).
    *
    * The k hash functions are a universal family g_i(h) = (a_i·h + b_i)
    * mod p over ONE base hash per shingle (char-codepoint polynomial) —
    * the textbook minhash construction, one pass over the characters
    * instead of k independent string hashes, and (unlike Murmur3)
    * expressible in DuckDB, so the whole LSH candidate set is
    * oracle-checked. The signature stage is pure map-side
    * (`array_min(transform(...))`), zero shuffle; duplicates within a
    * doc cannot change a min so no per-doc distinct is needed. The only
    * shuffles are the band-bucket join and final distinct, both on
    * compact keys.
    */
  def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashPairsOf(T(s, d, "documents").select("doc_id", "text"))

  /** Document-frequency cap for the exact n-gram Jaccard inverted
    * index: shingles in more than this many documents are treated as
    * corpus boilerplate and excluded from the Jaccard universe
    * (numerator AND denominator — see dedup_ngram_jaccard scaladoc).
    * Bounds the per-shingle self-join emission at cap², independent
    * of corpus size.
    */
  val NgramJaccardDfCap = 1024

  private val MinhashP = 1000000007L
  private def affineA(i: Int): Long = (i + 1) * 1000003L % MinhashP
  private def affineB(i: Int): Long = i * 12345L + 7L

  /** (doc_id, hs: array<bigint>) — 3-token shingle hashes per document.
    *
    * Built from per-TOKEN hashes (each character hashed exactly once,
    * by the native codegen'd token_poly_hash) combined per 3-window
    * over the long array — no shingle strings are ever materialized,
    * and the window combine is a zip over shifted slices (the fast HOF
    * shape; per-element indexing through `transform(sequence(...))`
    * measured 5× slower). Docs with <3 tokens hash all their tokens as
    * one shingle, matching the string formulation's whole-doc fallback.
    * Shared by minhash candidate generation and the candidate-verify
    * Jaccard step, so both stages agree on shingle identity.
    */
  def shingleHashes(docs: DataFrame): DataFrame = {
    val S = 1000033L
    // NOT spread (r18, measured): the native tokenPolyHash + zip_with
    // narrow stage is too cheap for an extra exchange to pay for itself
    // — candidates_verified 1.08s -> 1.47s with a T.spread here. The
    // string-shingle xxhash64 path (dedup_ngram_jaccard) IS spread.
    docs
      // NULL text would carry hs=NULL downstream: every NULL doc's
      // band minima turn NULL, concat_ws collapses them all to sig ""
      // — an O(k²) all-pairs clique in the candidate join — while the
      // oracle's unnest simply drops the docs. Drop them here, once,
      // for every consumer.
      .filter(col("text").isNotNull)
      .withColumn("tok", split(col("text"), " "))
      .withColumn("th", graft.functions.text.tokenPolyHash(col("tok")))
      .withColumn("hs", expr(
        s"""CASE WHEN size(th) >= 3 THEN
           |  zip_with(slice(th, 1, size(th) - 2),
           |    zip_with(slice(th, 2, size(th) - 2), slice(th, 3, size(th) - 2),
           |      (y, z) -> (y * ${S}L + z) % ${MinhashP}L),
           |    (x, yz) -> (x * ${S}L + yz) % ${MinhashP}L)
           |ELSE array(aggregate(th, CAST(0 AS BIGINT),
           |  (a, h) -> (a * ${S}L + h) % ${MinhashP}L)) END""".stripMargin))
      .select("doc_id", "hs")
  }

  /** Banded minhash signature table `(doc_id, band, sig)` over any
    * (doc_id, text) DataFrame — 4 bands × 3 rows via ONE generator
    * explode. A per-band union would repeat the signature subtree 4×
    * per join side (no exchange below it to reuse), re-running the
    * k-minhash pipeline 8× in the self-join; materializing the tiny
    * signature table (|docs| × 4 rows of compact keys) makes it
    * exactly once. This IS the persisted index of a production
    * incremental dedup: the standing corpus's band table is maintained
    * once and each arriving batch probes it.
    */
  def minhashBands(docs: DataFrame): DataFrame =
    minhashBandsFromHashes(shingleHashes(docs))

  /** Band table from an ALREADY-COMPUTED (doc_id, hs) frame — lets a
    * caller that also needs the raw shingles (the verify stage) run
    * the shingle pipeline exactly once for both consumers.
    */
  def minhashBandsFromHashes(sh: DataFrame): DataFrame = {
    val k = 12
    val sigs = sh
      .select(col("doc_id") +:
        (0 until k).map(i =>
          array_min(transform(col("hs"),
            h => (lit(affineA(i)) * h + lit(affineB(i))) % lit(MinhashP))).as(s"m$i")): _*)
    sigs.select(col("doc_id"), explode(array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until 3).map(r => col(s"m${b * 3 + r}")): _*).as("sig"))
    }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .localCheckpoint()
  }

  /** Same, over any (doc_id, text) DataFrame. */
  def minhashPairsOf(docs: DataFrame): DataFrame = {
    val bands = minhashBands(docs)
    val a = bands.select(col("band"), col("sig"), col("doc_id").as("a"))
    val b = bands.select(col("band"), col("sig"), col("doc_id").as("b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** DuckDB CTEs for the shingle stage alone: per-doc token hashes →
    * 3-shingle hashes (`sh(doc_id, h)`). Mirrors [[shingleHashes]]
    * exactly; shared by the minhash oracle and the per-shingle
    * analytics oracles (novelty).
    */
  private def shingleCtesSql: String =
    s"""th AS (
       |  SELECT doc_id, list_transform(str_split(text, ' '), t ->
       |           list_reduce(list_prepend(CAST(0 AS BIGINT),
       |             list_transform(str_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
       |             (a, b) -> (a * 31 + b) % $MinhashP)) AS th
       |  FROM documents),
       |     sh AS (
       |  SELECT doc_id, unnest(CASE WHEN len(th) >= 3
       |    THEN [(th[i] * 1000033 + (th[i+1] * 1000033 + th[i+2]) % $MinhashP) % $MinhashP
       |          FOR i IN range(1, len(th) - 1)]
       |    ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), th),
       |            (a, h) -> (a * 1000033 + h) % $MinhashP)] END) AS h
       |  FROM th)""".stripMargin

  /** Shared DuckDB CTEs: per-doc token hashes → shingle hashes → k
    * minhash minima → banded signatures → candidate pairs. Mirrors
    * [[shingleHashes]] + [[minhashPairsOf]] exactly.
    */
  private def minhashCtesSql: String = {
    val mins = (0 until 12).map(i =>
      s"min((${affineA(i)} * h + ${affineB(i)}) % $MinhashP) AS m$i").mkString(", ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, concat_ws('_', m${3 * b}, m${3 * b + 1}, m${3 * b + 2}) AS sig FROM mins")
      .mkString(" UNION ALL ")
    s"""$shingleCtesSql,
       |     mins AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |     bands AS ($bands),
       |     pairs AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |               FROM bands l JOIN bands r
       |                 ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id)""".stripMargin
  }

  private def minhashOracleSql: String =
    s"""WITH $minhashCtesSql
       |SELECT a, b FROM pairs ORDER BY a, b""".stripMargin

  q("dedup_near_minhash", minhashOracleSql) { (s, d) =>
    minhashPairs(s, d).orderBy("a", "b") // pair count scales with dup density = input-sized
  }

  /** MinHash estimator calibration over the banded candidates — the
    * accuracy audit a production near-dup deployment runs before
    * trusting signature-only thresholds (SPEC: Broder 1997's estimator
    * E[matches/k] = J, with k = 12 here, so per-pair |err| is expected
    * ~√(J(1−J)/12) ≈ 0.14 worst-case): per candidate pair, the
    * signature estimate (matching minima / 12), the exact shingle
    * Jaccard, and their gap. ONE shingle pass feeds signatures, bands
    * AND verify sets (the verifiedJaccardPairs checkpoint discipline);
    * every value is a single fixed-shape ratio of integers (rule 5) —
    * est and exact are exact rationals, the gap one subtraction of
    * identical operands — so the row is hash-exact with no tolerance
    * machinery. Candidate-bounded output (banded, never all-pairs).
    */
  q("dedup_minhash_calibration", {
    val mmExpr = (0 until 12)
      .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $minhashCtesSql,
       |jsh AS (SELECT DISTINCT doc_id, h FROM sh),
       |cnt AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY 1),
       |itr AS (SELECT p.a, p.b, count(*) AS i
       |        FROM pairs p JOIN jsh x ON x.doc_id = p.a
       |        JOIN jsh y ON y.doc_id = p.b AND y.h = x.h GROUP BY 1, 2),
       |mm AS (SELECT p.a, p.b, $mmExpr AS matches
       |       FROM pairs p JOIN mins sa ON sa.doc_id = p.a
       |       JOIN mins sb ON sb.doc_id = p.b)
       |SELECT m.a, m.b, CAST(m.matches AS INTEGER) AS matches,
       |       round(m.matches / 12.0, 6) AS est_jaccard,
       |       round(coalesce(i.i, 0) * 1.0
       |             / (ca.n + cb.n - coalesce(i.i, 0)), 6) AS exact_jaccard,
       |       round(abs(m.matches / 12.0 - coalesce(i.i, 0) * 1.0
       |             / (ca.n + cb.n - coalesce(i.i, 0))), 6) AS abs_err
       |FROM mm m
       |LEFT JOIN itr i ON i.a = m.a AND i.b = m.b
       |JOIN cnt ca ON ca.doc_id = m.a
       |JOIN cnt cb ON cb.doc_id = m.b
       |ORDER BY m.a, m.b""".stripMargin
  }) { (s, d) =>
    val docs = T(s, d, "documents").select("doc_id", "text")
    val sh = shingleHashes(docs).localCheckpoint()
    val sigs = sh.select(col("doc_id") +:
      (0 until 12).map(i =>
        array_min(transform(col("hs"),
          h => (lit(affineA(i)) * h + lit(affineB(i))) % lit(MinhashP))).as(s"m$i")): _*)
    val bands = minhashBandsFromHashes(sh)
    val cand = bands.select(col("band"), col("sig"), col("doc_id").as("a"))
      .join(bands.select(col("band"), col("sig"), col("doc_id").as("b")),
        Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val jsh = sh.select(col("doc_id"), explode(col("hs")).as("h"))
      .distinct().localCheckpoint()
    val counts = jsh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(jsh.select(col("doc_id").as("a"), col("h")), Seq("a"))
      .join(jsh.select(col("doc_id").as("b"), col("h")), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    val matches = (0 until 12)
      .map(i => when(col(s"ma$i") === col(s"mb$i"), 1).otherwise(0))
      .reduce(_ + _)
    val est = col("matches") / lit(12.0)
    val exact = coalesce(col("i"), lit(0L)) * lit(1.0) /
      (col("na") + col("nb") - coalesce(col("i"), lit(0L)))
    cand
      .join(sigs.select(col("doc_id").as("a") +:
        (0 until 12).map(i => col(s"m$i").as(s"ma$i")): _*), Seq("a"))
      .join(sigs.select(col("doc_id").as("b") +:
        (0 until 12).map(i => col(s"m$i").as(s"mb$i")): _*), Seq("b"))
      .withColumn("matches", matches)
      .join(inter, Seq("a", "b"), "left")
      .join(counts.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(counts.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("matches").cast("int").as("matches"),
        round(est, 6).as("est_jaccard"),
        round(exact, 6).as("exact_jaccard"),
        round(abs(est - exact), 6).as("abs_err"))
      .orderBy("a", "b") // candidate-bounded output
  }

  /** SimHash near-dup: 32-bit simhash over token hashes; docs sharing the
    * full simhash (or a band of it) are near-dup candidates. Computed
    * entirely map-side by the codegen'd [[graft.functions.SimHash32]]
    * expression — same per-token hash and vote math as the
    * explode+groupBy formulation it replaced, with zero shuffle. The
    * token hash (char polynomial → Knuth spread) is SQL-expressible, so
    * the DuckDB oracle reproduces the fingerprints bit-for-bit.
    */
  def simhash(s: SparkSession, d: String): DataFrame =
    T(s, d, "documents").select(col("doc_id"),
      graft.functions.text.simhash32(split(col("text"), " ")).as("simhash"))

  private def simhashOracleSql: String = {
    val bits = (0 until 32).map(b =>
      s"(CASE WHEN sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) > 0 " +
        s"THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)").mkString(" + ")
    s"""WITH tk AS (
       |  SELECT doc_id, unnest(list_transform(str_split(text, ' '), t ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(str_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % 1000000007) * 2654435761 % 4294967296)) AS h
       |  FROM documents),
       |     sh AS (SELECT doc_id, $bits AS simhash FROM tk GROUP BY doc_id)
       |SELECT simhash, count(*) AS n, min(doc_id) AS keep_id
       |FROM sh GROUP BY simhash ORDER BY simhash""".stripMargin
  }

  q("dedup_simhash", simhashOracleSql) { (s, d) =>
    // groups of docs sharing a simhash value = near-dup clusters
    simhash(s, d)
      .groupBy("simhash")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))
      .orderBy("simhash") // ~one row per distinct simhash = input-sized
  }

  /** N-gram Jaccard over the DF-CAPPED shingle universe: exact Jaccard
    * over 3-shingle sets, with shingles appearing in more than
    * [[NgramJaccardDfCap]] documents dropped from BOTH the intersection
    * and the set sizes. The cap is what bounds the inverted-index
    * self-join at scale: per shingle the join emits df² pairs, so an
    * uncapped boilerplate shingle ("all rights reserved") squares on
    * the whole corpus — capped, emission per shingle is ≤ cap², and
    * total work is ∝ Σ min(df, cap)². Dropping high-df shingles from
    * numerator AND denominator is the C4/RefinedWeb boilerplate rule
    * re-expressed as a similarity: a shingle shared by >cap documents
    * carries no pair-discriminative signal, and the capped Jaccard
    * biases toward CONTENT overlap. On corpora whose true near-dup
    * clusters are smaller than the cap the capped and uncapped
    * measures coincide exactly — pinned in OpsSemanticsSpec against
    * the uncapped fold at test SF.
    */
  q("dedup_ngram_jaccard",
    s"""WITH sh0 AS (
      |  SELECT DISTINCT doc_id, sh AS shingle FROM (
      |    SELECT doc_id, unnest([list_aggr(tok[i:i+2], 'string_agg', ' ')
      |                           FOR i IN range(1, greatest(len(tok) - 2, 1) + 1)]) AS sh
      |    FROM (SELECT doc_id, str_split(text, ' ') AS tok FROM documents) t1) t2),
      |     keep AS (SELECT shingle FROM sh0 GROUP BY shingle
      |              HAVING count(*) <= $NgramJaccardDfCap),
      |     sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
      |     pairs AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b,
      |         count(*) AS inter, any_value(na.n) AS na, any_value(nb.n) AS nb
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  JOIN (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1) na ON na.doc_id = a.doc_id
      |  JOIN (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1) nb ON nb.doc_id = b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a, b, round(inter * 1.0 / (na + nb - inter), 6) AS jaccard
      |FROM pairs WHERE inter * 1.0 / (na + nb - inter) >= 0.8 ORDER BY a, b""") { (s, d) =>
    // shingles are joined/counted by 64-bit hash, not string: identical
    // equality semantics w.h.p. (collision odds ~n²/2⁶⁵) with an ~8-byte
    // shuffle key instead of a ~20-byte string — the self-join and both
    // distinct/count shuffles shrink accordingly.
    val sh0 = T.spread(T(s, d, "documents"), col("doc_id"))
      .withColumn("tok", split(col("text"), " "))
      .withColumn("shs", expr(
        "transform(sequence(0, greatest(size(tok) - 3, 0)), i -> concat_ws(' ', slice(tok, i + 1, 3)))"))
      .select(col("doc_id"), explode(expr("transform(shs, x -> xxhash64(x))")).as("shingle"))
      .distinct()
    // df-cap: drop boilerplate shingles before the self-join (the
    // semi-join probe side is the df table — one row per distinct
    // shingle, AQE broadcast-eligible long after the doc table isn't).
    val sh = sh0.join(
      sh0.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= NgramJaccardDfCap).select("shingle"),
      Seq("shingle"), "left_semi")
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("a"), col("shingle"))
    val b = sh.select(col("doc_id").as("b"), col("shingle"))
    val inter = a.join(b, Seq("shingle")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(counts.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("jaccard",
        round(col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")) >= 0.8)
      .select("a", "b", "jaccard")
      .orderBy("a", "b") // input-sized
  }

  /** The production near-dup shape, composed end-to-end: banded-minhash
    * LSH generates candidate pairs, exact Jaccard verifies ONLY those
    * candidates — the verify join is |candidates| × shingles-per-doc,
    * never the all-pairs self-join of `dedup_ngram_jaccard` (which
    * stays registered as the exhaustive correctness baseline). Both
    * stages share [[shingleHashes]], so candidate generation and
    * verification agree on shingle identity, and the whole pipeline is
    * hash-checked by one composed DuckDB oracle.
    */
  q("dedup_candidates_verified",
    s"""WITH $verifiedPairsCtesSql
       |SELECT a, b, jaccard FROM vp ORDER BY a, b""".stripMargin) { (s, d) =>
    verifiedJaccardPairs(s, d).orderBy("a", "b") // input-sized
  }

  /** DuckDB CTEs for the full banded-LSH → exact-verify pipeline:
    * `vp(a, b, jaccard)` = candidate pairs from [[minhashCtesSql]]'s
    * band buckets, kept iff exact Jaccard over the full shingle sets
    * is ≥ 0.8. Mirrors [[verifiedJaccardPairs]]; shared by the
    * verified-pairs oracle and the component oracles built on it.
    */
  private def verifiedPairsCtesSql: String =
    s"""$minhashCtesSql,
       |     jsh AS (SELECT DISTINCT doc_id, h FROM sh),
       |     cnt AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY doc_id),
       |     inter AS (
       |  SELECT p.a, p.b, count(*) AS i FROM pairs p
       |  JOIN jsh x ON x.doc_id = p.a
       |  JOIN jsh y ON y.doc_id = p.b AND y.h = x.h
       |  GROUP BY p.a, p.b),
       |     vp AS (
       |  SELECT i.a, i.b, round(i.i * 1.0 / (na.n + nb.n - i.i), 6) AS jaccard
       |  FROM inter i JOIN cnt na ON na.doc_id = i.a JOIN cnt nb ON nb.doc_id = i.b
       |  WHERE i.i * 1.0 / (na.n + nb.n - i.i) >= 0.8)""".stripMargin

  /** Banded-minhash candidates verified by exact Jaccard (≥ 0.8) over
    * FULL shingle sets — the shared pair stage behind the verified
    * registry row and both clustering consumers. The verify join costs
    * |candidates| × shingles-per-doc with candidates bounded by band
    * collisions, never an inverted-index df² blowup. `jsh` feeds three
    * subtrees (counts + both verify sides) — checkpointed so the
    * shingle pipeline runs once; blocks freed by releaseCheckpoints.
    */
  private[ops] def verifiedJaccardPairs(s: SparkSession, d: String): DataFrame = {
    val docs = T(s, d, "documents").select("doc_id", "text")
    // ONE shingle pass feeds both the band stage and the verify sets —
    // the checkpoint is what makes that literal, not aspirational (the
    // old shape re-ran tokenize+hash once for the bands and once for
    // jsh: the dominant map-side cost, paid twice)
    val sh = shingleHashes(docs).localCheckpoint()
    val bands = minhashBandsFromHashes(sh)
    val a = bands.select(col("band"), col("sig"), col("doc_id").as("a"))
    val b = bands.select(col("band"), col("sig"), col("doc_id").as("b"))
    val cand = a.join(b, Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
    val jsh = sh
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .distinct()
      .localCheckpoint()
    val counts = jsh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(jsh.select(col("doc_id").as("a"), col("h")), Seq("a"))
      .join(jsh.select(col("doc_id").as("b"), col("h")), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    inter
      .join(counts.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(counts.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("jaccard",
        round(col("i") * lit(1.0) / (col("na") + col("nb") - col("i")), 6))
      .filter(col("i") * lit(1.0) / (col("na") + col("nb") - col("i")) >= 0.8)
      .select("a", "b", "jaccard")
  }

  /** Connected components by iterative min-label propagation (the
    * Pregel/large-star shape: each round, every node takes the min label
    * among itself and its neighbors; rounds needed = graph diameter,
    * each round = one join + one aggregation — no driver-side graph).
    * Converges by checking the changed-label count per round, the
    * standard distributed-CC loop. `maxIter` is a RUNAWAY GUARD, not a
    * result truncation: labels spread one hop per round, so a
    * still-changing round `maxIter` means the pair graph's diameter
    * exceeds it — returning those labels would silently split one
    * component into several (duplicates surviving dedup, oracle
    * mismatches), so the loop THROWS instead. 32 rounds cover any
    * non-adversarial near-dup graph (dup clusters are near-cliques,
    * diameter 1–2; a drifting chain of borderline pairs is the only
    * shape that approaches the cap — raise it explicitly there).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 32): DataFrame = {
    // localCheckpoint blocks outlive the query unless freed: across a
    // long session (the bench runs ~100 queries × 3 reps in one JVM)
    // the per-round blocks accumulated in the block manager and the
    // in-bench time drifted to ~2.6× the isolated time. Track the
    // persistent-RDD ids each checkpoint creates and free every
    // round's blocks as soon as the next round's checkpoint (which
    // re-materializes all still-needed state) exists. Only the FINAL
    // round's blocks — they back the returned frame's truncated
    // lineage — survive this call; Bench/Verify clear those between
    // queries via releaseCheckpoints().
    val sc = edges.sparkSession.sparkContext
    def persisted: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def free(ids: Set[Int]): Unit = ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val pre0 = persisted
    // materialize the edge list once: every propagation round joins
    // against it, and without this the upstream candidate pipeline
    // (e.g. the whole Jaccard computation) would re-execute per round
    val obsE = org.apache.spark.sql.Observation()
    val symRaw = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .observe(obsE, count(lit(1)).as("n"))
      .localCheckpoint()
    val symIds = persisted -- pre0
    // adapt iteration parallelism to the materialized edge count (free —
    // the count rides the checkpoint materialization as an observed
    // metric, r18: was a separate count job): near-dup pair graphs are
    // typically tiny relative to the corpus, and per-round
    // task-scheduling overhead dominates when 32 tasks each hold a
    // handful of edges. ~500k edges per partition, capped at the
    // session's parallelism.
    val edgeCount = obsE.get("n").asInstanceOf[Long]
    val parts = math.max(1, math.min((edgeCount / 500000L).toInt + 1,
      edges.sparkSession.sparkContext.defaultParallelism))
    val sym = symRaw.coalesce(parts)
    val nodes = sym.select(col("src").as("id")).distinct()
    var labels = nodes.withColumn("lbl", col("id"))
    var iter = 0
    var converged = false
    var prevIds = Set.empty[Int]
    while (iter < maxIter && !converged) {
      // One round = neighbor labels unioned with own labels into ONE
      // min-aggregation (r18: was join + groupBy + left-join — the
      // union-min form computes the identical least() with fewer
      // exchanges, and under AQE every exchange is its own stage job).
      // `own` tags the old label; max() sees exactly one non-null per
      // id because labels is unique by id.
      val nbr = sym
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("lbl", "nlbl"), Seq("dst"))
        .select(col("src").as("id"), col("nlbl").as("v"),
          lit(null).cast("long").as("own"))
      val own = labels.select(col("id"), col("lbl").as("v"), col("lbl").as("own"))
      // localCheckpoint truncates the per-iteration lineage growth that
      // would otherwise make round N's plan O(N) deep (the classic
      // iterative-algorithm failure at scale) and materializes the
      // round's labels once for both the convergence check and round
      // N+1. The changed-label count rides that materialization as an
      // observed metric — no extra count job per round.
      val obs = org.apache.spark.sql.Observation()
      val pre = persisted
      val next = nbr.unionByName(own)
        .groupBy("id").agg(min("v").as("lbl"), max("own").as("old"))
        .observe(obs, sum(when(col("lbl") =!= col("old"), 1L)
          .otherwise(0L)).as("chg"))
        .select("id", "lbl")
        .localCheckpoint()
      // round N's blocks are dead once round N+1 is materialized
      // (localCheckpoint is eager): free them now, not at session end
      free(prevIds)
      prevIds = persisted -- pre
      // sum() over an empty frame observes null — treat as converged
      val changed = Option(obs.get("chg")).map(_.asInstanceOf[Long]).getOrElse(0L)
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged) {
      // free the edge list AND the last round's labels before throwing:
      // a caller that catches and retries with a larger maxIter must not
      // accumulate pinned checkpoint blocks per failed attempt (the
      // block-manager drift this function's frees exist to prevent)
      free(prevIds)
      free(symIds)
      throw new IllegalArgumentException(
        s"connectedComponents: not converged after $maxIter rounds — the pair " +
          "graph's diameter exceeds maxIter; raise it rather than use split labels")
    }
    // the edge list is only joined inside the loop; the final labels
    // checkpoint no longer references it
    free(symIds)
    labels
  }

  /** Shared oracle prefix: the verified near-dup pair graph +
    * recursive-CTE component labels (comp = (doc_id, canonical)).
    * Pairs are [[verifiedPairsCtesSql]]'s `vp` — banded-minhash LSH
    * candidates verified by exact Jaccard ≥ 0.8 over full shingle
    * sets, the production dedup shape (Lee et al. 2021): candidate
    * volume is bounded by band-signature collisions, so no single
    * boilerplate shingle can force an inverted-index df² blowup, and
    * the clustering queries share their edge stage verbatim with the
    * registered `dedup_candidates_verified` row.
    */
  private lazy val jaccardCompSql =
    s"""$verifiedPairsCtesSql,
      |     edges AS (SELECT a, b FROM vp UNION SELECT b, a FROM vp),
      |     reach(src, dst) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      |     comp AS (
      |  SELECT src AS doc_id, least(src, min(dst)) AS canonical FROM reach GROUP BY src)""".stripMargin

  /** Canonical representative per near-dup cluster: components over the
    * exact-Jaccard (≥0.8) pair graph; every clustered doc maps to the
    * lowest doc_id in its component. Oracle: DuckDB recursive CTE over
    * the same pair set.
    */
  q("dedup_cluster_canonical",
    s"""WITH RECURSIVE $jaccardCompSql
       |SELECT doc_id, canonical FROM comp ORDER BY doc_id""".stripMargin) { (s, d) =>
    connectedComponents(jaccardPairs(s, d))
      .select(col("id").as("doc_id"), col("lbl").as("canonical"))
      .orderBy("doc_id") // one row per clustered doc = input-sized
  }

  /** Quality-aware cluster selection — what production dedup actually
    * keeps: not the lowest-id member but the BEST one (here: longest,
    * doc_id tiebreak). Same component labels as
    * [[dedup_cluster_canonical]]; the winner per cluster comes from a
    * window over the cluster-count-sized (doc, cluster, quality) frame,
    * then joins back on the cluster key — never touches corpus-sized
    * state beyond the pair pipeline it shares.
    */
  q("dedup_keep_best",
    s"""WITH RECURSIVE $jaccardCompSql,
       |     best AS (
       |  SELECT canonical, doc_id AS keep_id, row_number() OVER (
       |    PARTITION BY canonical ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM comp JOIN documents USING (doc_id))
       |SELECT c.doc_id, b.keep_id FROM comp c
       |JOIN (SELECT canonical, keep_id FROM best WHERE rn = 1) b USING (canonical)
       |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
    val comp = connectedComponents(jaccardPairs(s, d))
      .select(col("id").as("doc_id"), col("lbl").as("canonical"))
    val w = Window.partitionBy("canonical")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val best = comp.join(T(s, d, "documents").select("doc_id", "n_chars"), Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("canonical"), col("doc_id").as("keep_id"))
    comp.join(best, Seq("canonical"))
      .select("doc_id", "keep_id")
      .orderBy("doc_id") // one row per clustered doc = input-sized
  }

  /** Near-dup pair graph (exact Jaccard ≥ 0.8 over 3-shingles) — the
    * shared edge-list stage behind cluster canonicalization and
    * keep-best selection. Candidates come from the banded-minhash LSH
    * the verified pipeline already uses ([[verifiedJaccardPairs]]);
    * exact Jaccard over FULL shingle sets is verify-only. Replaces
    * both prior generators (the uncapped inverted-index self-join —
    * df² on one boilerplate shingle — and its df-capped variant,
    * which still paid Σ df² candidate emission plus a
    * candidates×postings rebuild and benched ~7× slower than this
    * composed form at sf0.1). Candidate volume is bounded by band
    * collisions: a shingle shared by every document moves no pair
    * unless a whole 3-row band signature matches.
    */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame =
    verifiedJaccardPairs(s, d).select("a", "b")

  // -------------------------------------------------------- similarity

  /** Brute-force cosine top-k (correctness baseline; documented as
    * bounded-side only — the probe set must be broadcastable). Cosine is
    * the native codegen'd [[graft.functions.VecCosine]] over the raw
    * float arrays — one pass per pair, no unit-vector materialization.
    */
  def cosineTopK(s: SparkSession, d: String, k: Int, probeIds: Seq[Long]): DataFrame = {
    val all = T(s, d, "embeddings").select("vec_id", "embedding")
    val probes = all.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    all.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", graft.functions.vec.cosine(col("embedding"), col("qemb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nbr"), round(col("cos"), 6).as("cos"), col("rn"))
  }

  // Oracle-checkable: VecCosine accumulates in double, so the rounded
  // value matches DuckDB's double-list cosine exactly (verified at sf0.01).
  q("sim_cosine_topk",
    """WITH probes AS (
      |  SELECT vec_id AS qid, embedding AS qemb FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
      |     ranked AS (
      |  SELECT p.qid, e.vec_id AS nbr,
      |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                      CAST(p.qemb AS DOUBLE[])), 6) AS cos,
      |         CAST(row_number() OVER (PARTITION BY p.qid
      |              ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                              CAST(p.qemb AS DOUBLE[])) DESC,
      |                       e.vec_id) AS INTEGER) AS rn
      |  FROM embeddings e, probes p WHERE e.vec_id <> p.qid)
      |SELECT qid, nbr, cos, rn FROM ranked WHERE rn <= 5 ORDER BY qid, rn""") { (s, d) =>
    cosineTopK(s, d, k = 5, probeIds = Seq(0L, 1L, 2L, 3L, 4L))
      .reportSorted("qid", "rn")
  }

  /** Random-hyperplane LSH: sign bits of dot products with deterministic
    * pseudo-random hyperplanes → bucket id. ANN search equi-joins on the
    * bucket instead of cross-joining — the 100 TB path (bucket count grows
    * with 2^nPlanes; recall recovered via multiple tables if needed).
    */
  /** Deterministic hyperplane components in [-0.5, 0.5) — Murmur-seeded
    * at PLAN time, so they are plain literals in both the Spark plan and
    * the generated oracle SQL (the oracle never recomputes the hash).
    */
  private[ops] def planeComps(p: Int, dim: Int = 64): IndexedSeq[Double] =
    (0 until dim).map { i =>
      val h = scala.util.hashing.MurmurHash3.caseClassHash((p, i))
      (((h % 1000) + 1000) % 1000) / 1000.0 - 0.5
    }

  /** DuckDB expression for the nPlanes-bit bucket of `embedding`;
    * `planeId` maps the local plane ordinal to the global plane id
    * (identity for the single-table queries, table-offset for the
    * multi-table composition).
    */
  private def bucketSql(nPlanes: Int, planeId: Int => Int = identity): String =
    (0 until nPlanes).map { p =>
      s"CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), " +
        s"[${planeComps(planeId(p)).mkString(", ")}]) > 0 THEN '1' ELSE '0' END"
    }.mkString("concat(", ", ", ")")

  /** Sign-bit bucket of a vector column under the given global plane
    * ids — the Spark twin of [[bucketSql]], fully map-side. THE single
    * bucketing rule: every hyperplane consumer (single-table, multi-
    * table, multimodal features) must route through here so the `> 0`
    * tie convention stays bit-identical with the oracle SQL everywhere.
    */
  private[ops] def signBucketExpr(vec: org.apache.spark.sql.Column, dim: Int,
      planeIds: Seq[Int]): org.apache.spark.sql.Column =
    concat_ws("", planeIds.map { id =>
      // r19: ONE array literal node instead of CreateArray over 64
      // lit() children — shrinks every LSH bucketing expression tree
      // ~64×, which AQE re-analyzes per stage materialization
      val plane = typedLit(planeComps(id, dim).toArray)
      when(graft.functions.vec.dot(vec, plane) > 0, lit(1)).otherwise(lit(0))
    }: _*)

  def lshBucketed(s: SparkSession, d: String, nPlanes: Int): DataFrame = {
    // sign(dot(unit, plane)) == sign(dot(raw, plane)) — norms are positive,
    // so bucketing runs on the raw float arrays; no normalization pass.
    T(s, d, "embeddings").select("vec_id", "embedding", "label")
      .withColumn("bucket", signBucketExpr(col("embedding"), 64, 0 until nPlanes))
      .select("vec_id", "embedding", "label", "bucket")
  }

  /** ONE body for the in-bucket cosine top-3 (SQL + Spark) — the
    * unfiltered and metadata-filtered rows differ ONLY in the join key
    * (`bucket` vs composite `(bucket, label)`); a shared builder makes
    * that claim structural, so a ranking/tie-break tweak cannot drift
    * the two apart.
    */
  private def lshTopkSql(keys: Seq[String]): String = {
    val extra = keys.filterNot(_ == "bucket")
    val joinOn = keys.map(k => s"l.$k = r.$k").mkString(" AND ")
    val sel = extra.map(k => s"l.$k, ").mkString
    val out = extra.map(k => s"$k, ").mkString
    s"""WITH bk AS (SELECT vec_id, embedding${extra.map(", " + _).mkString},
       |            ${bucketSql(8)} AS bucket FROM embeddings),
       |     j AS (SELECT l.vec_id AS qid, ${sel}r.vec_id AS nbr,
       |                  round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
       |                                               CAST(r.embedding AS DOUBLE[])), 6) AS cos
       |           FROM bk l JOIN bk r ON $joinOn AND l.vec_id <> r.vec_id)
       |SELECT qid, ${out}nbr, cos, rn FROM (
       |  SELECT qid, ${out}nbr, cos,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rn
       |  FROM j) t
       |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }

  private def lshTopk(s: SparkSession, d: String, keys: Seq[String]): DataFrame = {
    val extra = keys.filterNot(_ == "bucket")
    val b = lshBucketed(s, d, nPlanes = 8)
    // duplicate-collapsed in-bucket ranking (r16): identical
    // embeddings share a bucket by construction, so the collapse keeps
    // a mega-dup cluster from regrowing the pair join quadratically —
    // output provably identical to the naive self-join (see
    // [[collapsedPairTopK]]'s exactness argument)
    collapsedPairTopK(b.select((keys :+ "vec_id" :+ "embedding").distinct.map(col): _*),
      "vec_id", keys, Seq("embedding"),
      (qc, nc) => round(graft.functions.vec.cosine(
        qc("embedding"), nc("embedding")), 6), 3)
      .select(Seq(col("qid")) ++ extra.map(col) ++
        Seq(col("nbr"), col("score").as("cos"), col("rn")): _*)
      .orderBy("qid", "rn") // top-k PER VECTOR = input-sized
  }

  // Oracle: plane constants are inlined as SQL literals (see planeComps),
  // so DuckDB reproduces the exact bucketing + in-bucket ranking.
  q("sim_ann_lsh", lshTopkSql(Seq("bucket"))) { (s, d) =>
    // in-bucket cosine top-k per vector: self-equi-join on bucket
    lshTopk(s, d, Seq("bucket"))
  }

  /** Metadata-FILTERED ANN (the vector-store capability every 2020s
    * retrieval stack grew: "top-k nearest WHERE label = X"): the
    * filter is pushed INTO the index key — candidates equi-join on the
    * COMPOSITE (label, bucket), not on bucket alone. The alternative,
    * post-filtering an unfiltered bucket's candidates, silently
    * starves recall for minority labels (a fixed-k candidate set is
    * mostly wrong-label rows); composing the key gives each label its
    * own bucket space at zero extra passes — the partition-by-filter-
    * key design production IVF/LSH stores use. Here every vector
    * queries for its own label (the kNN-classifier / same-class-
    * neighbor eval shape); an external predicate would bind the label
    * column instead. Same planes, tie-breaks, and in-bucket ranking as
    * [[sim_ann_lsh]] — the diff is ONLY the join key.
    */
  q("sim_ann_filtered", lshTopkSql(Seq("bucket", "label"))) { (s, d) =>
    lshTopk(s, d, Seq("bucket", "label"))
  }

  /** IVF (inverted-file) ANN: K coarse centroids sampled
    * deterministically from the corpus (first K by vec_id — a k-means
    * refinement would drop in here unchanged); every vector is assigned
    * to its nearest centroid map-side (K codegen'd vec_cosine calls per
    * row against centroid literals — no shuffle, no per-row join);
    * search probes the query's nProbe nearest cells and ranks in-cell.
    * Driver state is the O(K·dim) centroid table only — the standard
    * IVF coarse-quantizer shape, independent of corpus size.
    */
  def ivfCells(s: SparkSession, d: String, kCells: Int): DataFrame = {
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val centroids = emb.orderBy("vec_id").limit(kCells).collect()
      .map(_.getSeq[Float](1).toArray)
    ivfAssign(emb, centroids)
  }

  /** (vec_id, embedding, cell) with cell = argmax cosine over centroid
    * literals; `cellRank` additionally keeps the full preference order
    * for probe-side nProbe expansion.
    */
  private[ops] def ivfAssign(emb: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    emb.withColumn("cell", ivfRanked(centroids)(0).getField("cell"))

  private def ivfRanked(centroids: Array[Array[Float]]) =
    sort_array(array(centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      val cLit = typedLit(c.map(_.toDouble)) // r19: one literal node
      struct(graft.functions.vec.cosine(col("embedding"), cLit).as("cos"),
        lit(i).as("cell"))
    }: _*), asc = false)

  // Fully deterministic (first-K centroids, double-accumulated cosines,
  // aligned tie-breaks: centroid rank ties → cell DESC, top-k ties →
  // nbr ASC) → oracle-checkable, unlike the Murmur-seeded LSH variant.
  q("sim_ann_ivf",
    """WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb
      |           FROM embeddings ORDER BY vec_id LIMIT 8),
      |     ranked AS (
      |       SELECT e.vec_id, e.embedding, c.cid,
      |              row_number() OVER (PARTITION BY e.vec_id
      |                ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cemb) DESC,
      |                         c.cid DESC) AS cr
      |       FROM embeddings e CROSS JOIN c),
      |     cells AS (SELECT vec_id, cid AS cell FROM ranked WHERE cr = 1),
      |     probes AS (SELECT vec_id AS qid, embedding AS qemb, cid AS cell
      |                FROM ranked WHERE vec_id < 5 AND cr <= 2),
      |     cand AS (
      |       SELECT p.qid, x.vec_id AS nbr,
      |              round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
      |                                           CAST(p.qemb AS DOUBLE[])), 6) AS cos
      |       FROM probes p
      |       JOIN (SELECT cl.vec_id, cl.cell, e2.embedding
      |             FROM cells cl JOIN embeddings e2 USING (vec_id)) x ON x.cell = p.cell
      |       WHERE x.vec_id <> p.qid)
      |SELECT qid, nbr, cos, rn FROM (
      |  SELECT qid, nbr, cos,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rn
      |  FROM cand) t
      |WHERE rn <= 3 ORDER BY qid, rn""") { (s, d) =>
    val kCells = 8
    val nProbe = 2
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val centroids = emb.orderBy("vec_id").limit(kCells).collect()
      .map(_.getSeq[Float](1).toArray)
    val cells = ivfAssign(emb, centroids)
    val probes = emb.filter(col("vec_id") < 5)
      .withColumn("pc", slice(ivfRanked(centroids), 1, nProbe))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        explode(col("pc").getField("cell")).as("cell"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(graft.functions.vec.cosine(col("qemb"), col("embedding")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"), col("rn"))
      .reportSorted("qid", "rn")
  }

  /** SPHERICAL k-means refinement of the IVF coarse quantizer — the
    * training loop the [[sim_ann_ivf]] scaladoc points at. Assignment
    * is by cosine, which sees only a vector's DIRECTION — so the
    * update step must average unit vectors (the mean direction), not
    * raw coordinates: a raw mean lets long vectors dominate and breaks
    * Lloyd's monotone-objective guarantee under the cosine objective.
    * Each iteration: map-side argmax assignment against centroid
    * LITERALS (no per-row join), then ONE shuffle on (cell, pos) for
    * the two-phase per-coordinate mean — k·dim compact rows back to
    * the driver, the same O(K·dim) driver state the static IVF already
    * holds. Empty cells keep their previous centroid. Per-coordinate
    * means are floor-quantized to the 1e-6 grid before the float cast
    * (see [[pageRank]]'s determinism device) — partition-order sum
    * ulps die at every iteration, so the trained centroids replay
    * bit-identically from an unrolled SQL recurrence and the consumer
    * query is FULLY hash-checked since round 10. The accuracy
    * contract (cosine objective monotone, trained ≤ seeded
    * quantization error) stays pinned in IvfKMeansSpec.
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): Array[Array[Float]] = {
    var cents = emb.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Float](1).toArray)
    for (_ <- 1 to iters) {
      val sums = ivfAssign(emb, cents)
        .withColumn("nrm", graft.functions.vec.norm(col("embedding")))
        .filter(col("nrm") > 0) // zero vectors have no direction to vote
        .select(col("cell"), col("nrm"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(col("x").cast("double") / col("nrm")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            val arr = new Array[Float](cents(c).length)
            // floor-quantize the mean to the 1e-6 grid BEFORE the float
            // cast (the pageRank determinism device): the shuffled sum's
            // partition-order ulps die here, so the trained centroids —
            // and everything downstream — replay bit-identically in SQL
            rows.foreach { r =>
              val m = r.getDouble(2) / r.getLong(3)
              arr(r.getInt(1)) = (math.floor(m * 1e6 + 0.5000005) / 1e6).toFloat
            }
            arr
          case None => cents(c)
        }
      }.toArray
    }
    cents
  }

  /** Mean fractional quantization error avg(1 - cos(x, nearest
    * centroid)) — the scalar IvfKMeansSpec tracks across iterations.
    */
  def ivfQuantError(emb: DataFrame, cents: Array[Array[Float]]): Double =
    emb.select((lit(1.0) - ivfRanked(cents)(0).getField("cos")).as("err"))
      .agg(avg("err")).head.getDouble(0)

  /** IVF search over TRAINED centroids (2 Lloyd iterations): identical
    * plan shape to [[sim_ann_ivf]] — map-side cell assignment, probe
    * explode, broadcast candidates join — only the quantizer improves.
    * HASH-CHECKED since round 10: [[kmeansCentroids]]' quantized means
    * replay from SQL, so the oracle unrolls BOTH Lloyd iterations as
    * chained CTEs — assignment by unrounded argmax cosine (cell DESC
    * ties, exactly ivfRanked's sort), unit-normalized per-coordinate
    * means floor-quantized then pushed through REAL→DOUBLE to mirror
    * the Array[Float] storage, empty cells inheriting the previous
    * centroid — then runs the sim_ann_ivf search over the trained
    * frame. Position zip uses generate_series (no WITH ORDINALITY in
    * DuckDB, checklist rule 9).
    */
  /** One unrolled spherical-Lloyd iteration as chained CTEs: given a
    * centroid table `$prev(cid, cemb)`, emits `$out(cid, cemb)` —
    * unrounded argmax-cosine assignment (cid DESC ties, exactly
    * ivfRanked's sort), unit-normalized per-coordinate means
    * floor-quantized to the 1e-6 grid then pushed through REAL→DOUBLE
    * to mirror the Array[Float] storage, empty cells inheriting the
    * previous centroid. Shared by the trained-quantizer oracles
    * ([[sim_ann_ivf_trained]], [[sim_ann_ivfpq_trained]]).
    */
  private def lloydCte(prev: String, out: String): String =
    s""",
       |     a_$out AS (
       |  SELECT e.vec_id, c.cid, CAST(e.embedding AS DOUBLE[]) AS de,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cemb) DESC,
       |                    c.cid DESC) AS cr
       |  FROM embeddings e CROSS JOIN $prev c),
       |     x_$out AS (
       |  SELECT cid AS cell,
       |         unnest(generate_series(1, len(de))) - 1 AS pos,
       |         unnest(de) AS x,
       |         sqrt(list_inner_product(de, de)) AS nrm
       |  FROM a_$out WHERE cr = 1 AND list_inner_product(de, de) > 0),
       |     m_$out AS (
       |  SELECT cell, pos,
       |         CAST(CAST(floor((sum(x / nrm) / count(*)) * 1000000 +
       |                         CAST(0.5000005 AS DOUBLE)) / 1000000 AS REAL) AS DOUBLE) AS m
       |  FROM x_$out GROUP BY cell, pos),
       |     $out AS (
       |  SELECT p.cid,
       |         coalesce(g.cemb, p.cemb) AS cemb
       |  FROM $prev p
       |  LEFT JOIN (SELECT cell AS cid, list(m ORDER BY pos) AS cemb
       |             FROM m_$out GROUP BY cell) g ON g.cid = p.cid)""".stripMargin

  q("sim_ann_ivf_trained", {
    s"""WITH c0 AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb
       |            FROM embeddings ORDER BY vec_id LIMIT 8)""".stripMargin +
      lloydCte("c0", "c1") + lloydCte("c1", "c2") +
      s""",
         |     ranked AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cemb) DESC,
         |                    c.cid DESC) AS cr
         |  FROM embeddings e CROSS JOIN c2 c),
         |     cells AS (SELECT vec_id, cid AS cell FROM ranked WHERE cr = 1),
         |     probes AS (SELECT vec_id AS qid, embedding AS qemb, cid AS cell
         |                FROM ranked WHERE vec_id < 5 AND cr <= 2),
         |     cand AS (
         |  SELECT p.qid, x.vec_id AS nbr,
         |         round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
         |                                      CAST(p.qemb AS DOUBLE[])), 6) AS cos
         |  FROM probes p
         |  JOIN (SELECT cl.vec_id, cl.cell, e2.embedding
         |        FROM cells cl JOIN embeddings e2 USING (vec_id)) x ON x.cell = p.cell
         |  WHERE x.vec_id <> p.qid)
         |SELECT qid, nbr, cos, rn FROM (
         |  SELECT qid, nbr, cos,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rn
         |  FROM cand) t
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }) { (s, d) =>
    val kCells = 8
    val nProbe = 2
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val centroids = kmeansCentroids(emb, kCells, iters = 2)
    val cells = ivfAssign(emb, centroids)
    val probes = emb.filter(col("vec_id") < 5)
      .withColumn("pc", slice(ivfRanked(centroids), 1, nProbe))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        explode(col("pc").getField("cell")).as("cell"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(graft.functions.vec.cosine(col("qemb"), col("embedding")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"), col("rn"))
      .reportSorted("qid", "rn")
  }

  // ------------------------------------------------ product quantization

  /** Deterministic PQ codebook `[m][k][j]`: for subspace m (M=8
    * subspaces × 8 dims), centroid k is the (k+1)-th embedding's m-th
    * subvector (vec_id order) — the same first-K deterministic stand-in
    * [[sim_ann_ivf]] uses for its coarse quantizer; per-subspace Lloyd
    * ([[kmeansCentroids]]) drops in unchanged.
    */
  private def pqCodebook(emb: DataFrame): Array[Array[Array[Double]]] = {
    val firstK = emb.orderBy("vec_id").limit(16).collect().map(_.getSeq[Float](1))
    require(firstK.nonEmpty, "pq: empty embeddings table — no codebook")
    // K follows the data like the oracle's LIMIT 16 does: a corpus
    // with <16 vectors yields a smaller codebook on BOTH engines
    // (indexing a literal 16 would AIOOBE on one and diverge on the other)
    Array.tabulate(8, firstK.length)(
      (m, k) => (0 until 8).map(j => firstK(k)(m * 8 + j).toDouble).toArray)
  }

  /** PQ/SDC oracle, parameterized on shortlist depth: the rerank query
    * embeds a top-`topK` shortlist form (no final projection/ORDER BY)
    * inside its own CTEs; the standalone query uses the top-3 report
    * form. One builder — no string surgery on a sibling's SQL.
    */
  private def pqOracleSql(topK: Int, report: Boolean,
      trained: Boolean = false): String = {
    val tail =
      if (report) s"WHERE rn <= $topK ORDER BY qid, rn"
      else s"WHERE rn <= $topK"
    val firstK =
      s"""  SELECT m, k, [CAST(embedding[m*8 + j + 1] AS DOUBLE) FOR j IN range(0, 8)] AS c
         |  FROM (SELECT embedding, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS k
         |        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)) e,
         |       unnest(generate_series(0, 7)) AS mm(m)""".stripMargin
    // one Lloyd iteration prev → out: L2 argmin assignment (k-asc ties,
    // matching pq_encode), per-(m,k,j) floor-quantized means, empty
    // cells inherit — the SQL replay of pqTrainedCodebook's recurrence
    def lloyd(prev: String, out: String): String =
      s"""     enc_$out AS (
         |  SELECT v.vec_id, cb.m, cb.k, v.embedding,
         |         row_number() OVER (PARTITION BY v.vec_id, cb.m ORDER BY
         |           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |             [(CAST(v.embedding[cb.m*8 + j + 1] AS DOUBLE) - cb.c[j + 1])
         |              * (CAST(v.embedding[cb.m*8 + j + 1] AS DOUBLE) - cb.c[j + 1])
         |              FOR j IN range(0, 8)]), (a, b) -> a + b), cb.k) AS rn
         |  FROM embeddings v CROSS JOIN $prev cb),
         |     mu_$out AS (
         |  SELECT e.m, e.k, jj.j,
         |         floor((sum(CAST(e.embedding[e.m*8 + jj.j + 1] AS DOUBLE)) / count(*))
         |               * 1000000 + CAST(0.5000005 AS DOUBLE)) / 1000000 AS mu
         |  FROM enc_$out e, unnest(generate_series(0, 7)) AS jj(j)
         |  WHERE e.rn = 1 GROUP BY e.m, e.k, jj.j),
         |     $out AS (
         |  SELECT p.m, p.k, coalesce(g.c, p.c) AS c
         |  FROM $prev p
         |  LEFT JOIN (SELECT m, k, list(mu ORDER BY j) AS c
         |             FROM mu_$out GROUP BY m, k) g ON g.m = p.m AND g.k = p.k),""".stripMargin
    val cbChain =
      if (!trained) s"WITH cb AS (\n$firstK),"
      else s"WITH cb0 AS (\n$firstK),\n" + lloyd("cb0", "cbi1") + "\n" +
        lloyd("cbi1", "cbi2") + "\n     cb AS (SELECT m, k, c FROM cbi2),"
    s"""$cbChain
       |     enc AS (
       |  SELECT v.vec_id, cb.m, cb.k,
       |         row_number() OVER (PARTITION BY v.vec_id, cb.m ORDER BY
       |           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |             [(CAST(v.embedding[cb.m*8 + j + 1] AS DOUBLE) - cb.c[j + 1])
       |              * (CAST(v.embedding[cb.m*8 + j + 1] AS DOUBLE) - cb.c[j + 1])
       |              FOR j IN range(0, 8)]), (a, b) -> a + b), cb.k) AS rn
       |  FROM embeddings v CROSS JOIN cb),
       |     recon AS (
       |  SELECT e.vec_id, list(cb.c ORDER BY e.m) AS subs
       |  FROM enc e JOIN cb ON cb.m = e.m AND cb.k = e.k
       |  WHERE e.rn = 1 GROUP BY e.vec_id),
       |     bk AS (SELECT vec_id, ${bucketSql(8)} AS bucket FROM embeddings),
       |     cand AS (SELECT l.vec_id AS qid, r.vec_id AS nbr
       |              FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id),
       |     scored AS (
       |  SELECT c.qid, c.nbr,
       |         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           [list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |              [ra.subs[m + 1][j + 1] * rb.subs[m + 1][j + 1] FOR j IN range(0, 8)]),
       |              (x, y) -> x + y) FOR m IN range(0, 8)]), (x, y) -> x + y), 6) AS adot
       |  FROM cand c
       |  JOIN recon ra ON ra.vec_id = c.qid
       |  JOIN recon rb ON rb.vec_id = c.nbr)
       |SELECT qid, nbr, adot, rn FROM (
       |  SELECT qid, nbr, adot,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY adot DESC, nbr) AS INTEGER) AS rn
       |  FROM scored) t
       |$tail""".stripMargin
  }

  /** Duplicate-collapsed in-bucket top-k pair ranking (r16) — the
    * mega-duplicate-cluster bound the r15 verdict promoted to #1. The
    * naive in-bucket self-join is Θ(Σ n_b²): correct scaling when the
    * bucket law pins n_b ≈ targetCell, but a raw crawl corpus carries
    * MEGA-DUPLICATE clusters (10⁴–10⁹ copies of one embedding), and
    * identical vectors land in the SAME final bucket by construction —
    * one hot bucket regrows the pair join quadratically IN THE CLUSTER
    * SIZE. This device is the SemDeDup-style representative collapse
    * (Abbas et al. 2023's observation that exact/near-exact dup groups
    * are interchangeable for neighbor ranking), made EXACT for the
    * registered (score desc, nbr asc) top-k contract:
    *
    *  1. group same-bucket rows by PAYLOAD equality (the score is a
    *     pure function of payloads, so group members are candidates
    *     with identical scores); rep = min member id — which is also
    *     the group's best-ranked member under the nbr-asc tie-break;
    *  2. pair-join REPRESENTATIVES only (Θ(Σ distinct_b²) — a dup
    *     cluster of ANY size is ONE row here);
    *  3. per query group keep the top-k FOREIGN groups by
    *     (score desc, rep asc) + the own group; keep each group's
    *     first k+1 member ids;
    *  4. expand every vector against its group's shortlist
    *     (≤ (k+1)² candidates per vector) and re-rank.
    *
    * EXACTNESS (why every consumer row stays hash-identical to the
    * uncapped join): any group contributing a top-k candidate for q
    * has its min member in q's top-k too (same score, smaller id ⇒
    * ranks no worse), so ≤ k foreign groups contribute and they are
    * precisely the first ≤ k in (score desc, rep asc) order — a group
    * outside that prefix is dominated by k rep-candidates that all
    * outrank its best member. Within a group only the first k+1
    * members can reach a member's top-k (same score ⇒ id order; +1
    * covers the member itself being among them). The own group rides
    * unconditionally because its min member may be q itself (excluded
    * as self), which breaks the min-member argument for it — and
    * under PQ/SDC scoring the self-score need not be maximal.
    *
    * Candidate volume: Θ(Σ distinct_b² + n·k²) — a 50k-copy planted
    * cluster contributes 1 group and k+1 expand rows per member
    * (StressProbe `dup:` mode measures the law). Cost on dup-free
    * corpora: the same bucket-keyed pair join volume plus two linear
    * window passes — no extra asymptotics.
    *
    * `scoreOf` builds the pair score from q-side / n-side payload
    * column resolvers; it MUST depend only on payload columns (that is
    * what makes group members interchangeable). Returns one row per
    * (qid, rn ≤ k): bucketCols…, qid, nbr, score, rn.
    */
  private[ops] def collapsedPairTopK(frame: DataFrame, idCol: String,
      bucketCols: Seq[String], payloadCols: Seq[String],
      scoreOf: (String => Column, String => Column) => Column,
      k: Int): DataFrame = {
    val grpKey = (bucketCols ++ payloadCols).map(col)
    val wGrpAll = Window.partitionBy(grpKey: _*)
    val wGrp = wGrpAll.orderBy(col(idCol))
    // one pass tags every row with its group id (= min member id);
    // checkpointed once, read by the member lists, the rep frame and
    // the final expand
    val tagged = frame
      .withColumn("_rep", min(col(idCol)).over(wGrpAll))
      .withColumn("_grn", row_number().over(wGrp))
      .localCheckpoint()
    val members = tagged.filter(col("_grn") <= k + 1)
      .groupBy(col("_rep").as("_nrep"))
      .agg(sort_array(collect_list(col(idCol))).as("_mem"))
    val reps = tagged.filter(col("_grn") === 1)
    val q = reps.select(bucketCols.map(col) ++
      payloadCols.map(c => col(c).as(s"_q_$c")) :+ col("_rep").as("_qrep"): _*)
    val nn = reps.select(bucketCols.map(col) ++
      payloadCols.map(c => col(c).as(s"_n_$c")) :+ col("_rep").as("_nrep"): _*)
    val pairs = q.join(nn, bucketCols)
      .withColumn("_s", scoreOf(c => col(s"_q_$c"), c => col(s"_n_$c")))
      .select("_qrep", "_nrep", "_s")
    val wg = Window.partitionBy("_qrep").orderBy(col("_s").desc, col("_nrep").asc)
    val shortlist = pairs.filter(col("_qrep") =!= col("_nrep"))
      .withColumn("_gr", row_number().over(wg))
      .filter(col("_gr") <= k).drop("_gr")
      .unionByName(pairs.filter(col("_qrep") === col("_nrep")))
      .join(members, Seq("_nrep"))
    val wq = Window.partitionBy("_qid").orderBy(col("_s").desc, col("_nbr").asc)
    tagged
      .select(bucketCols.map(col) :+ col(idCol).as("_qid") :+
        col("_rep").as("_qrep"): _*)
      .join(shortlist, Seq("_qrep"))
      .select(bucketCols.map(col) :+ col("_qid") :+ col("_s") :+
        explode(col("_mem")).as("_nbr"): _*)
      .filter(col("_qid") =!= col("_nbr"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= k)
      .select(bucketCols.map(col) :+ col("_qid").as("qid") :+
        col("_nbr").as("nbr") :+ col("_s").as("score") :+ col("rn"): _*)
  }

  /** Top-`topK` PQ/SDC code ranking per query vector — the shared
    * Spark-side stage behind `sim_ann_pq` (report form) and
    * `sim_ann_pq_rerank` (shortlist form): score same-bucket pairs via
    * the 8 precomputed 16×16 inner-product literal tables (the PQ
    * trick — scoring never touches a vector), rank per query. Routed
    * through [[collapsedPairTopK]] with the CODE TUPLE as the payload
    * (identical embeddings ⇒ identical residuals ⇒ identical codes),
    * so a mega-duplicate cluster costs one group, not cluster² pairs.
    * Columns: qid, nbr, adot, rn.
    */
  private def pqCodeTopK(encoded: DataFrame,
      cb: Array[Array[Array[Double]]], topK: Int): DataFrame = {
    val ip = Array.tabulate(8)(m => Array.tabulate(256) { i =>
      (0 until 8).foldLeft(0.0)((acc, j) => acc + cb(m)(i / 16)(j) * cb(m)(i % 16)(j))
    })
    val score = (qc: String => Column, nc: String => Column) =>
      round((0 until 8).foldLeft(lit(0.0)) { (acc, m) =>
        acc + element_at(typedLit(ip(m)), // r19: one literal node
          (qc(s"c$m") * 16 + nc(s"c$m") + 1).cast("int"))
      }, 6)
    collapsedPairTopK(encoded, "vec_id", Seq("bucket"),
      (0 until 8).map(m => s"c$m"), score, topK)
      .withColumnRenamed("score", "adot")
  }

  /** Product-quantization ANN (SPEC: FAISS PQ — Jégou et al. 2011):
    * each vector compresses to M=8 one-byte codes (one per 8-dim
    * subspace, nearest of K=16 codebook subvectors) and candidate
    * ranking runs ENTIRELY on codes via the precomputed symmetric
    * inner-product tables ip[m][ka][kb] — the SDC scheme. 8 bytes per
    * vector through the candidate shuffle (vs 64 for sq8, 256 for
    * float32), and the verify is 8 literal-array lookups + adds per
    * pair, no vector arithmetic at all. Encoding is map-side argmin
    * against codebook literals; the first-K deterministic codebook
    * keeps every fold oracle-reproducible (the accuracy upgrade is
    * per-subspace Lloyd, exactly as IVF's trained variant).
    */
  /** (vec_id, bucket, c0..c7): map-side PQ encode via the native
    * codegen'd `pq_encode` expression — one tight loop per row against
    * the flattened codebook literal (the equivalent Column-expression
    * tree is ~6k nodes, falls out of whole-stage codegen on size, and
    * measured ~40× slower interpreted). Materialized ONCE
    * (localCheckpoint) so the self-join's two sides reuse the 12 B/row
    * code frame — same pattern as mm_ann_topk's checkpoint.
    */
  private[ops] def pqEncoded(s: SparkSession, d: String,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    val cbFlat = typedLit(cb.flatten.flatten) // r19: one literal node
    lshBucketed(s, d, nPlanes = 8)
      .withColumn("pq", graft.functions.vec.pqEncode(col("embedding"), cbFlat, 8, 16))
      .select(col("vec_id") +: col("bucket") +:
        (0 until 8).map(m => element_at(col("pq"), m + 1).as(s"c$m")): _*)
      .localCheckpoint()
  }

  private[ops] def pqCodebookOf(s: SparkSession, d: String): Array[Array[Array[Double]]] =
    pqCodebook(T(s, d, "embeddings").select("vec_id", "embedding"))

  /** Per-subspace Lloyd-trained PQ codebook (SPEC: the real FAISS
    * training recipe — Jégou et al. 2011 §III.A: independent k-means
    * in each of the M subspaces, L2 objective). Seeded with the
    * deterministic first-K codebook; each iteration is ONE map-side
    * `pq_encode` pass (argmin code per subspace against codebook
    * literals — no per-row join) followed by ONE shuffle keyed on
    * (subspace, code, dim) — at most M·K·dim = 1024 groups, so the
    * driver state stays O(M·K·dim) doubles exactly like the IVF
    * trainer. Empty cells keep their previous centroid. NOT spherical
    * [[kmeansCentroids]]: PQ minimizes RECONSTRUCTION error, so the
    * update step is the plain per-coordinate mean under L2, not the
    * mean direction under cosine. Means are floor-quantized to the
    * 1e-6 grid (the [[pageRank]] determinism device), so the trained
    * codebook replays bit-identically from the unrolled SQL recurrence
    * and the consumer query is FULLY hash-checked since round 10; the
    * accuracy contract (trained distortion ≤ first-K distortion)
    * stays pinned in LshRecallSpec.
    */
  private[ops] def pqTrainedCodebook(emb: DataFrame, iters: Int): Array[Array[Array[Double]]] = {
    var cb = pqCodebook(emb)
    for (_ <- 1 to iters) {
      val cbFlat = typedLit(cb.flatten.flatten) // r19: one literal node
      val sums = emb
        .withColumn("pq", graft.functions.vec.pqEncode(col("embedding"), cbFlat, 8, 16))
        .select(posexplode(col("embedding")).as(Seq("pos", "x")), col("pq"))
        .withColumn("m", (col("pos") / 8).cast("int"))
        .select(col("m"), (col("pos") % 8).cast("int").as("j"),
          element_at(col("pq"), col("m") + 1).cast("int").as("k"),
          col("x").cast("double").as("x"))
        .groupBy("m", "k", "j")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(8, 16)((m, k) => cb(m)(k).clone())
      // floor-quantize to the 1e-6 grid (the pageRank determinism
      // device): the shuffled sum's partition-order ulps die here, so
      // the trained codebook replays bit-identically from SQL
      sums.foreach { r =>
        val mu = r.getDouble(3) / r.getLong(4)
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          math.floor(mu * 1e6 + 0.5000005) / 1e6
      }
      cb = next
    }
    cb
  }

  /** Mean squared PQ reconstruction error avg(Σ_m ‖x_m − c_{m,code}‖²)
    * — the distortion scalar the LshRecallSpec training contract
    * tracks. One map-side pass: encode, then 64 literal-indexed
    * squared diffs per row.
    */
  private[ops] def pqDistortion(emb: DataFrame, cb: Array[Array[Array[Double]]]): Double = {
    val cbFlat = typedLit(cb.flatten.flatten) // r19: one literal node
    val enc = emb.withColumn("pq",
      graft.functions.vec.pqEncode(col("embedding"), cbFlat, 8, 16))
    val err = (0 until 8).flatMap { m =>
      (0 until 8).map { j =>
        val x = element_at(col("embedding"), m * 8 + j + 1).cast("double")
        val c = element_at(cbFlat,
          ((lit(m * 16) + element_at(col("pq"), m + 1)) * 8 + j + 1).cast("int"))
        (x - c) * (x - c)
      }
    }.reduce(_ + _)
    enc.select(avg(err).as("d")).head.getDouble(0)
  }

  /** PQ/SDC ANN over the Lloyd-TRAINED codebook — identical plan shape
    * to `sim_ann_pq` (map-side native encode, bucket self-join,
    * literal-table SDC scoring); only the quantizer improves.
    * HASH-CHECKED since round 10: the quantized trainer (see
    * [[pqTrainedCodebook]]) replays from pqOracleSql's trained mode,
    * which unrolls both Lloyd iterations as CTEs ahead of the shared
    * SDC search SQL.
    */
  q("sim_ann_pq_trained", pqOracleSql(topK = 3, report = true, trained = true)) { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val cb = pqTrainedCodebook(emb, iters = 2)
    pqCodeTopK(pqEncoded(s, d, cb), cb, topK = 3)
      .select("qid", "nbr", "adot", "rn")
      .orderBy("qid", "rn") // top-k per vector = input-sized
  }

  q("sim_ann_pq", pqOracleSql(topK = 3, report = true)) { (s, d) =>
    val cb = pqCodebookOf(s, d)
    pqCodeTopK(pqEncoded(s, d, cb), cb, topK = 3)
      .select("qid", "nbr", "adot", "rn")
      .orderBy("qid", "rn") // top-k per vector = input-sized
  }

  /** Two-stage retrieval (SPEC: the production FAISS/ScaNN serving
    * pattern — coarse quantized shortlist, exact rerank): the PQ code
    * ranking above shortlists the top-10 per query on 8-byte codes,
    * then ONLY the shortlist joins the float embeddings for an exact
    * cosine top-3. The expensive exact arithmetic runs on
    * |queries|·10 rows — never on the candidate set, never on the
    * corpus — which is the entire point of the pattern at 100 TB.
    */
  q("sim_ann_pq_rerank", {
    s"""WITH sl AS (
       |  SELECT qid, nbr FROM (${pqOracleSql(topK = 10, report = false)}) s),
       |     exact AS (
       |  SELECT sl.qid, sl.nbr,
       |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |  FROM sl
       |  JOIN embeddings ea ON ea.vec_id = sl.qid
       |  JOIN embeddings eb ON eb.vec_id = sl.nbr)
       |SELECT qid, nbr, cos, rn FROM (
       |  SELECT qid, nbr, cos,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rn
       |  FROM exact) t
       |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }) { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val cb = pqCodebookOf(s, d)
    val shortlist = pqCodeTopK(pqEncoded(s, d, cb), cb, topK = 10)
      .select("qid", "nbr")
    val wExact = Window.partitionBy("qid").orderBy(col("cos").desc, col("nbr").asc)
    shortlist
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("nbr"), col("embedding").as("ne")), Seq("nbr"))
      .withColumn("cos", round(graft.functions.vec.cosine(col("qe"), col("ne")), 6))
      .withColumn("rn", row_number().over(wExact))
      .filter(col("rn") <= 3)
      .select("qid", "nbr", "cos", "rn")
      .orderBy("qid", "rn") // top-3 per query = input-sized
  }

  /** Corpus-count-derived IVF cell count: one cell per ~125 vectors,
    * clamped to [8, 256] — the scaling law that keeps the same-cell
    * candidate volume Θ(n·125) at ANY corpus size (the r14 StressProbe
    * measured the FIXED-8-cell draft at 64× cost for 10× data: cells
    * that grow with the corpus make candidates quadratic, the exact
    * failure sim_ann_lsh_auto's plane law fixed for LSH). The 256
    * clamp bounds the centroid literal the residual transform carries
    * (256·64 doubles); past it, swap the literal for a broadcast
    * centroid table and train hierarchically — documented seam.
    */
  private[ops] def autoCells(n: Long): Int =
    math.max(8, math.min(256, math.round(n / 125.0).toInt))

  /** IVF+PQ composite index (SPEC: Jégou, Douze & Schmid 2011 §IV —
    * the IVFADC scheme minus the asymmetric query side: coarse-
    * quantize every vector to an IVF cell, PRODUCT-QUANTIZE THE
    * RESIDUAL x − c(cell), and rank same-cell candidates entirely on
    * residual codes via the SDC tables. THE production ANN layout —
    * FAISS IVFx,PQy — because on clustered corpora residuals
    * concentrate near 0, so the same 16-entry-per-subspace codebook
    * spends its resolution where the mass is; on THIS isotropic
    * synthetic corpus residuals do not concentrate — LshRecallSpec
    * reports both distortions honestly and pins the structural
    * contract instead). Composes the registered primitives:
    * [[sim_ann_ivf]]'s deterministic first-K coarse quantizer with K
    * DERIVED from the corpus count ([[autoCells]] — StressProbe
    * measured the fixed-K draft quadratic; the derived K holds the
    * cell size at ~125 so candidates stay Θ(n)), residuals as one
    * map-side transform against the flattened centroid literal,
    * [[pqCodebook]]-style first-16 RESIDUAL codebook, the native
    * codegen'd pq_encode, and [[pqCodeTopK]]'s literal-table SDC
    * self-join with the IVF CELL as the bucket — candidates never
    * leave their cell (8 code bytes per row through a cell-partitioned
    * shuffle). Every stage is deterministic and the data-parameterized
    * oracle is BUILT from the same derived K, so the gate at different
    * SFs replays different derivations — `n_cells` rides the output to
    * prove it; any wrong residual, cell, code or table entry reds the
    * hash.
    */
  /** Residual frame of the FLAT IVFADC layout: assign to the nearest
    * of ≤256 centroid literals map-side, residual x − c(cell) against
    * the flattened literal, bucket = cell. Shared by [[sim_ann_ivfpq]]
    * (first-K quantizer) and [[sim_ann_ivfpq_trained]] (Lloyd-refined
    * quantizer) — only the centroid table differs.
    */
  private def flatResid(emb: DataFrame, centroids: Array[Array[Float]]): DataFrame = {
    val dim = centroids(0).length
    val centsFlat = typedLit( // r19: one literal node
      centroids.flatMap(_.map(_.toDouble)))
    ivfAssign(emb, centroids)
      .withColumn("res", transform(col("embedding"),
        (x, j) => x.cast("double") -
          element_at(centsFlat, col("cell") * dim + j + 1)))
      .withColumn("bucket", col("cell").cast("long"))
      .localCheckpoint()
  }

  /** PQ stage over a (vec_id, bucket, res) residual frame: first-16
    * residual codebook, native codegen'd pq_encode, in-bucket SDC
    * top-3 via [[pqCodeTopK]]'s literal tables.
    */
  private def pqPartTopK(resid: DataFrame, kOut: Int): DataFrame = {
    val firstK = resid.orderBy("vec_id").limit(16).select("res").collect()
      .map(_.getSeq[Double](0))
    val cb = Array.tabulate(8, firstK.length)(
      (m, k) => (0 until 8).map(j => firstK(k)(m * 8 + j)).toArray)
    val cbFlat = typedLit(cb.flatten.flatten) // r19: one literal node
    val encoded = resid
      .withColumn("pq", graft.functions.vec.pqEncode(col("res"), cbFlat, 8, 16))
      .select(col("vec_id") +: col("bucket") +:
        (0 until 8).map(m => element_at(col("pq"), m + 1).as(s"c$m")): _*)
      .localCheckpoint()
    pqCodeTopK(encoded, cb, topK = 3)
      .select(col("qid"), col("nbr"), col("adot"), col("rn"),
        lit(kOut).as("n_cells"))
      .orderBy("qid", "rn") // top-k per vector = input-sized
  }

  qDyn("sim_ann_ivfpq") { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val n = emb.count()
    val rawCells = math.round(n / 125.0)
    if (rawCells <= 256) {
      // single-level: flattened centroid literal, map-side residual —
      // the flat IVFADC layout (K ≤ 256 bounds the literal)
      val kCells = autoCells(n)
      val centroids = emb.orderBy("vec_id").limit(kCells).collect()
        .map(_.getSeq[Float](1).toArray)
      pqPartTopK(flatResid(emb, centroids), kCells)
    } else {
      // past the clamp: TWO-LEVEL coarse quantizer ([[hierAssign]]) —
      // cell size stays ~125 at ANY corpus count, the sub-centroid
      // table replaces the centroid literal (joined, broadcast by AQE
      // while it fits, shuffle-equi on the coarse cell beyond), and
      // the residual is against the FINAL (sub) centroid. Candidate
      // volume stays Θ(n·125) where the flat index would regrow
      // Θ(n²/256) — the r14 watch item's documented seam, live.
      val k1 = hierK1(n, targetCell = 125)
      val resid = hierAssign(emb, k1, targetCell = 125)
        .withColumn("res", zip_with(col("embedding"), col("semb"),
          (x, c) => x.cast("double") - c.cast("double")))
        .withColumn("bucket",
          col("cell").cast("long") * lit(1048576L) + col("si"))
        .localCheckpoint()
      pqPartTopK(resid, k1)
    }
  } { (s, d) =>
    val nEmb = T(s, d, "embeddings").count()
    val rawCells = math.round(nEmb / 125.0)
    val kCells = autoCells(nEmb)
    val k1 = hierK1(nEmb, targetCell = 125)
    // prefix ends in a CTE `resid` = (vec_id, bucket, res); the PQ
    // suffix (codebook, encode, reconstruct, in-bucket SDC rank) is
    // identical across the flat and two-level branches
    val flatPrefix =
      s"""WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci,
      |                  CAST(embedding AS DOUBLE[]) AS cemb
      |           FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $kCells))""".stripMargin +
        pqResidFromCSql
    // two-level prefix: sim_ann_ivf_hier's derivation at targetCell=125,
    // residual against the FINAL (sub) centroid, bucket = cell·2²⁰ + si
    val hierPrefix =
      s"""WITH c1 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci,
      |            CAST(embedding AS DOUBLE[]) AS cemb
      |            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $k1)),
      |a1 AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS de, c.ci,
      |       row_number() OVER (PARTITION BY e.vec_id
      |         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cemb) DESC,
      |                  c.ci DESC) AS cr
      |       FROM embeddings e CROSS JOIN c1 c),
      |asg1 AS (SELECT vec_id, de, ci AS cell FROM a1 WHERE cr = 1),
      |sc AS (SELECT cell, si, semb FROM (
      |       SELECT cell, row_number() OVER (PARTITION BY cell ORDER BY vec_id) - 1 AS si,
      |              de AS semb, count(*) OVER (PARTITION BY cell) AS nc
      |       FROM asg1) t WHERE si < ceil(nc / 125.0)),
      |a2 AS (SELECT a.vec_id, a.de, a.cell, s.si, s.semb,
      |       row_number() OVER (PARTITION BY a.vec_id
      |         ORDER BY list_cosine_similarity(a.de, s.semb) DESC, s.si DESC) AS sr
      |       FROM asg1 a JOIN sc s USING (cell)),
      |     resid AS (
      |  SELECT vec_id, CAST(cell AS BIGINT) * 1048576 + si AS bucket,
      |         [de[j + 1] - semb[j + 1] FOR j IN range(0, 64)] AS res
      |  FROM a2 WHERE sr = 1)""".stripMargin
    val (prefix, kOut) =
      if (rawCells <= 256) (flatPrefix, kCells) else (hierPrefix, k1)
    prefix + pqSdcSuffixSql(kOut)
  }

  /** ranked + resid CTEs of the flat IVFADC oracle — assumes a CTE
    * `c(ci, cemb)` already holds the (dense-indexed, DOUBLE[]) centroid
    * table, which is where the first-K and Lloyd-trained variants
    * differ.
    */
  private def pqResidFromCSql: String =
    """,
      |     ranked AS (
      |  SELECT e.vec_id, e.embedding, c.ci,
      |         row_number() OVER (PARTITION BY e.vec_id
      |           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cemb) DESC,
      |                    c.ci DESC) AS cr
      |  FROM embeddings e CROSS JOIN c),
      |     resid AS (
      |  SELECT r.vec_id, CAST(r.ci AS BIGINT) AS bucket,
      |         [CAST(r.embedding[j + 1] AS DOUBLE) - c2.cemb[j + 1]
      |          FOR j IN range(0, 64)] AS res
      |  FROM ranked r JOIN c c2 ON c2.ci = r.ci WHERE r.cr = 1)""".stripMargin

  /** PQ codebook → encode → reconstruct → in-bucket SDC top-3: the
    * shared oracle suffix over any CTE `resid(vec_id, bucket, res)`.
    */
  private def pqSdcSuffixSql(kOut: Int): String =
    s""",
      |     cb AS (
      |  SELECT m, k, [res[m*8 + j + 1] FOR j IN range(0, 8)] AS c
      |  FROM (SELECT res, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS k
      |        FROM (SELECT * FROM resid ORDER BY vec_id LIMIT 16)) e,
      |       unnest(generate_series(0, 7)) AS mm(m)),
      |     enc AS (
      |  SELECT v.vec_id, cb.m, cb.k,
      |         row_number() OVER (PARTITION BY v.vec_id, cb.m ORDER BY
      |           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |             [(v.res[cb.m*8 + j + 1] - cb.c[j + 1])
      |              * (v.res[cb.m*8 + j + 1] - cb.c[j + 1])
      |              FOR j IN range(0, 8)]), (a, b) -> a + b), cb.k) AS rn
      |  FROM resid v CROSS JOIN cb),
      |     recon AS (
      |  SELECT e.vec_id, list(cb.c ORDER BY e.m) AS subs
      |  FROM enc e JOIN cb ON cb.m = e.m AND cb.k = e.k
      |  WHERE e.rn = 1 GROUP BY e.vec_id),
      |     cand AS (
      |  SELECT l.vec_id AS qid, r.vec_id AS nbr
      |  FROM resid l JOIN resid r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id),
      |     scored AS (
      |  SELECT c.qid, c.nbr,
      |         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           [list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |              [ra.subs[m + 1][j + 1] * rb.subs[m + 1][j + 1] FOR j IN range(0, 8)]),
      |              (x, y) -> x + y) FOR m IN range(0, 8)]), (x, y) -> x + y), 6) AS adot
      |  FROM cand c
      |  JOIN recon ra ON ra.vec_id = c.qid
      |  JOIN recon rb ON rb.vec_id = c.nbr)
      |SELECT qid, nbr, adot, rn, $kOut AS n_cells FROM (
      |  SELECT qid, nbr, adot,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY adot DESC, nbr) AS INTEGER) AS rn
      |  FROM scored) t
      |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** IVFADC over TRAINED coarse centroids — composes the registered
    * primitives exactly the way [[sim_ann_ivf_trained]] upgrades
    * [[sim_ann_ivf]]: the production ANN layout (IVF+PQ residual
    * codes) now carries the production trainer ([[kmeansCentroids]],
    * 2 spherical-Lloyd iterations with grid-quantized means — so the
    * trained table replays bit-identically from the unrolled SQL
    * recurrence). Everything downstream of the centroid table is the
    * [[flatResid]]/[[pqPartTopK]] path sim_ann_ivfpq uses; K derives
    * from the corpus count, so the gate replays different derivations
    * per SF. Distortion ≤ the first-K quantizer's is pinned in
    * LshRecallSpec.
    */
  qDyn("sim_ann_ivfpq_trained") { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val kCells = autoCells(emb.count())
    pqPartTopK(flatResid(emb, kmeansCentroids(emb, kCells, iters = 2)), kCells)
  } { (s, d) =>
    val kCells = autoCells(T(s, d, "embeddings").count())
    s"""WITH c0 AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb
       |            FROM embeddings ORDER BY vec_id LIMIT $kCells)""".stripMargin +
      lloydCte("c0", "c1") + lloydCte("c1", "c2") +
      """,
        |     c AS (SELECT row_number() OVER (ORDER BY cid) - 1 AS ci, cemb
        |           FROM c2)""".stripMargin +
      pqResidFromCSql + pqSdcSuffixSql(kCells)
  }

  // ------------------------------------------- two-level (hierarchical) IVF

  /** Coarse-level cell count for a two-level IVF targeting `targetCell`
    * vectors per FINAL cell: K1 = ⌈√(n/targetCell)⌉, so both levels
    * split ~√(totalCells) ways and assignment costs Θ(√(n/targetCell))
    * comparisons per vector instead of the flat index's Θ(n/targetCell)
    * — the hierarchy that keeps cell size pinned at ANY corpus count
    * (the [[autoCells]] 256-clamp seam). K1 itself re-hits 256 only at
    * n ≈ 8M·targetCell; past that the same recursion adds a third
    * level — documented, not yet needed by any registered surface.
    */
  private[ops] def hierK1(n: Long, targetCell: Int): Int =
    math.max(1, math.ceil(math.sqrt(
      math.max(1L, math.round(n.toDouble / targetCell)).toDouble)).toInt)

  /** Two-level IVF assignment: (vec_id, embedding, cell, si) where
    * (cell, si) is the final bucket. Level 1 is [[ivfAssign]]'s
    * map-side argmax against K1 centroid literals (first-K1 by vec_id);
    * level 2 picks, WITHIN each coarse cell, the first ⌈n_c/targetCell⌉
    * members by vec_id as sub-centroids (one shuffle on cell for the
    * row_number/count window) and assigns by an equi-join on the coarse
    * cell — each DISTINCT (cell, embedding) group meets only ITS cell's
    * sub-centroids (r16: identical vectors collapse to one scored row
    * through the join and fan back by tag — a mega-dup cluster costs
    * Θ(cluster), not Θ(cluster²/targetCell)), so the join carries
    * Θ(distinct·√(totalCells)) rows, never a cross product. The
    * sub-centroid table is |totalCells| rows (~n/targetCell): at gate
    * scale AQE broadcasts it; at 100 TB the join stays shuffle-equi on
    * the coarse cell — co-partitioned, skew-bounded because level 1
    * splits the corpus ~evenly by construction. Ties: coarse argmax
    * breaks cell DESC (ivfRanked's struct sort), sub argmax breaks si
    * DESC — both replayed verbatim by the oracle.
    */
  private[ops] def hierAssign(emb: DataFrame, k1: Int, targetCell: Int): DataFrame = {
    val coarse = emb.orderBy("vec_id").limit(k1).collect()
      .map(_.getSeq[Float](1).toArray)
    // checkpoint: feeds sub-centroid extraction AND the assignment join
    val asg1 = ivfAssign(emb, coarse)
      // duplicate-collapse tag (r16): the level-2 assignment is a pure
      // function of (cell, embedding), so identical vectors — which a
      // mega-duplicate cluster contributes by the million into ONE
      // coarse cell — need only ONE scored row each through the
      // sub-centroid join, not cluster·(n_c/targetCell). _crep = min
      // member id per (cell, embedding) group; the assignment computes
      // on group reps and joins back on the tag. Output-identical to
      // the per-row join ([[collapsedPairTopK]]'s exactness argument,
      // degenerate case: argmax instead of top-k).
      .withColumn("_crep",
        min(col("vec_id")).over(Window.partitionBy("cell", "embedding")))
      .localCheckpoint()
    val wCell = Window.partitionBy("cell").orderBy("vec_id")
    val sc = asg1
      .withColumn("si", row_number().over(wCell) - 1)
      .withColumn("nc", count(lit(1)).over(Window.partitionBy("cell")))
      .filter(col("si") < ceil(col("nc") / lit(targetCell.toDouble)))
      .select(col("cell"), col("si"), col("embedding").as("semb"))
    val wSub = Window.partitionBy("_crep")
      .orderBy(col("scos").desc, col("si").desc)
    val repAsg = asg1.filter(col("vec_id") === col("_crep"))
      .select("_crep", "cell", "embedding")
      .join(sc, Seq("cell"))
      .withColumn("scos", graft.functions.vec.cosine(col("embedding"), col("semb")))
      .withColumn("sr", row_number().over(wSub))
      .filter(col("sr") === 1)
      .select("_crep", "si", "semb")
    asg1.join(repAsg, Seq("_crep"))
      .select("vec_id", "embedding", "cell", "si", "semb")
  }

  /** Two-level IVF ANN — the scale path past [[autoCells]]' 256-cell
    * clamp, registered with targetCell=25 so the FULL hierarchy
    * (coarse split, per-cell sub-centroid derivation, two-stage
    * assignment) is hash-gated at every SF with different derived
    * shapes (K1=5 at 500 vectors, K1=9 at 2000 — `n_coarse` rides the
    * output to prove it). Candidates never leave their (cell, si)
    * bucket, whose size the law pins at ~targetCell independent of n —
    * candidate volume stays Θ(n·targetCell) where a flat index past
    * its clamp regrows Θ(n²/K). Exact-cosine in-bucket ranking, top-3
    * per vector. Pure selection (sub-centroids are corpus vectors, no
    * training) ⇒ the oracle replays every stage exactly.
    */
  qDyn("sim_ann_ivf_hier") { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val k1 = hierK1(emb.count(), targetCell = 25)
    // checkpoint: the final bucket frame feeds the collapse device's
    // member lists, rep frame and expand
    val asg2 = hierAssign(emb, k1, targetCell = 25).localCheckpoint()
    // duplicate-collapsed in-bucket exact-cosine ranking (r16): a
    // mega-duplicate cluster lands in ONE (cell, si) bucket by
    // construction; the collapse bounds its pair join at one group +
    // Θ(k) expand rows per member, output identical to the naive
    // self-join (see [[collapsedPairTopK]])
    collapsedPairTopK(asg2.select("cell", "si", "vec_id", "embedding"),
      "vec_id", Seq("cell", "si"), Seq("embedding"),
      (qc, nc) => round(graft.functions.vec.cosine(
        qc("embedding"), nc("embedding")), 6), 3)
      .select(col("qid"), col("nbr"), col("score").as("cos"), col("rn"),
        col("cell").as("coarse_cell"), col("si").cast("int").as("sub_cell"),
        lit(k1).as("n_coarse"))
      .orderBy("qid", "rn") // top-k per vector = input-sized
  } { (s, d) =>
    val k1 = hierK1(T(s, d, "embeddings").count(), targetCell = 25)
    s"""WITH c1 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci,
      |            CAST(embedding AS DOUBLE[]) AS cemb
      |            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $k1)),
      |a1 AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS de, c.ci,
      |       row_number() OVER (PARTITION BY e.vec_id
      |         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cemb) DESC,
      |                  c.ci DESC) AS cr
      |       FROM embeddings e CROSS JOIN c1 c),
      |asg1 AS (SELECT vec_id, de, ci AS cell FROM a1 WHERE cr = 1),
      |sc AS (SELECT cell, si, semb FROM (
      |       SELECT cell, row_number() OVER (PARTITION BY cell ORDER BY vec_id) - 1 AS si,
      |              de AS semb, count(*) OVER (PARTITION BY cell) AS nc
      |       FROM asg1) t WHERE si < ceil(nc / 25.0)),
      |a2 AS (SELECT a.vec_id, a.de, a.cell, s.si,
      |       row_number() OVER (PARTITION BY a.vec_id
      |         ORDER BY list_cosine_similarity(a.de, s.semb) DESC, s.si DESC) AS sr
      |       FROM asg1 a JOIN sc s USING (cell)),
      |asg2 AS (SELECT vec_id, de, cell, si FROM a2 WHERE sr = 1),
      |cand AS (SELECT l.vec_id AS qid, r.vec_id AS nbr,
      |         round(list_cosine_similarity(l.de, r.de), 6) AS cos,
      |         l.cell, l.si
      |         FROM asg2 l JOIN asg2 r ON l.cell = r.cell AND l.si = r.si
      |           AND l.vec_id <> r.vec_id)
      |SELECT qid, nbr, cos, rn, CAST(cell AS INTEGER) AS coarse_cell,
      |       CAST(si AS INTEGER) AS sub_cell, $k1 AS n_coarse FROM (
      |  SELECT qid, nbr, cos, cell, si,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rn
      |  FROM cand) t
      |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }

  /** Embedding-cosine near-dup: pairs above a cosine threshold, found
    * in-bucket (LSH) rather than by cross join.
    *
    * Approximation contract (measured in LshRecallSpec): precision is
    * exactly 1.0 — the cosine filter runs on every candidate — and
    * recall is the random-hyperplane collision probability
    * (1 - θ/π)^planes per table. The synthetic 0.45 threshold (random
    * embeddings peak near cos 0.51) sits at θ≈63°, where recall is
    * intentionally low; at production near-dup thresholds (cos ≥ 0.9,
    * θ≈26°) the same 6-plane table recalls ~40%, and OR-ing 4–8
    * independent tables — the standard multi-table amplification,
    * registered below as `sim_ann_lsh_multi` — reaches 87–98%
    * (measured in LshRecallSpec).
    */
  q("dedup_embedding_cosine",
    s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql(6)} AS bucket FROM embeddings)
       |SELECT DISTINCT l.vec_id AS a, r.vec_id AS b,
       |       round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
       |                                    CAST(r.embedding AS DOUBLE[])), 6) AS cos
       |FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
       |WHERE round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
       |                                   CAST(r.embedding AS DOUBLE[])), 6) >= 0.45
       |ORDER BY a, b""".stripMargin) { (s, d) =>
    val b = lshBucketed(s, d, nPlanes = 6)
    val l = b.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ua"))
    val r = b.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("ub"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos",
        round(graft.functions.vec.cosine(col("ua"), col("ub")), 6))
      .filter(col("cos") >= 0.45) // synthetic embeddings are random; max pair cos ≈ 0.51
      .select("a", "b", "cos")
      .distinct()
      .orderBy("a", "b") // input-sized
  }

  // ------------------------------------- multi-table LSH amplification

  /** Global plane id of plane `p` in table `t` — each table draws its
    * hyperplanes from a disjoint id range, so the tables are
    * independent (and none collides with the single-table queries'
    * planes 0–7).
    */
  private def tablePlane(t: Int)(p: Int): Int = 100 * (t + 1) + p


  /** Candidate pairs from OR-ing `nTables` independent hyperplane
    * tables — the standard multi-table LSH amplification: per-pair
    * recall r per table becomes 1-(1-r)^T across tables, while
    * precision stays 1.0 because every candidate is still verified by
    * exact cosine downstream. ONE scan computes every table's bucket
    * map-side; one generator explodes to (tbl, bucket) rows — compact
    * keys, no embedding payload rides along — and one self-equi-join
    * on (tbl, bucket) yields all tables' candidates at once. Candidate
    * volume ∝ Σ per-table bucket density — which is Θ(n²/2^nPlanes)
    * for n vectors, so a FIXED nPlanes is still asymptotically
    * quadratic: the parameter must scale with the corpus,
    * nPlanes ≈ log₂(n / targetBucketSize), to keep buckets
    * constant-sized (the registered demos use 6–8 planes sized to the
    * test corpora; ~10¹⁰ vectors wants ~24–30 planes, with more
    * tables to recover the per-pair recall each added plane costs).
    * That is exactly why the plane/table counts are parameters here
    * rather than constants inside.
    */
  /** Per-table LSH bucket rows (vec_id, tbl, bucket) on one scan —
    * the probe/index surface [[graft.streaming.StreamOps
    * .corpusSemDedup]] persists, factored from the candidate join so
    * stream and batch bucket DEFINITIONS cannot drift apart.
    */
  def multiLshBucketsOf(emb: DataFrame, nPlanes: Int, nTables: Int): DataFrame =
    emb.select(col("vec_id"), explode(array((0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        signBucketExpr(col("embedding"), 64,
          (0 until nPlanes).map(tablePlane(t))).as("bucket"))
    }: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))

  def multiLshCandidatesOf(emb: DataFrame, nPlanes: Int, nTables: Int): DataFrame = {
    val tb = multiLshBucketsOf(emb, nPlanes, nTables)
    val l = tb.select(col("tbl"), col("bucket"), col("vec_id").as("a"))
    val r = tb.select(col("tbl"), col("bucket"), col("vec_id").as("b"))
    l.join(r, Seq("tbl", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** `bk` + `cand` CTE bodies shared by the multi-table oracle SQL
    * builders: per-table bucket columns on one scan, UNION of the
    * per-table self-joins.
    */
  private def multiLshCandCtes(nPlanes: Int, nTables: Int): (String, String) = {
    val bucketCols = (0 until nTables)
      .map(t => s"${bucketSql(nPlanes, tablePlane(t))} AS b$t").mkString(",\n       ")
    val unions = (0 until nTables).map(t =>
      s"SELECT l.vec_id AS a, r.vec_id AS b FROM bk l JOIN bk r " +
        s"ON l.b$t = r.b$t AND l.vec_id < r.vec_id").mkString("\n  UNION\n  ")
    (bucketCols, unions)
  }

  private def multiLshOracleSql(nPlanes: Int, nTables: Int, thr: Double): String = {
    val (bucketCols, unions) = multiLshCandCtes(nPlanes, nTables)
    s"""WITH bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     cand AS (
       |  $unions)
       |SELECT c.a, c.b,
       |       round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                    CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |FROM cand c
       |JOIN embeddings ea ON ea.vec_id = c.a
       |JOIN embeddings eb ON eb.vec_id = c.b
       |WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                   CAST(eb.embedding AS DOUBLE[])), 6) >= $thr
       |ORDER BY a, b""".stripMargin
  }

  private def quantizedMultiOracleSql(nPlanes: Int, nTables: Int, thr: Double): String = {
    val (bucketCols, unions) = multiLshCandCtes(nPlanes, nTables)
    s"""WITH bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     q AS (SELECT vec_id,
       |             list_transform(CAST(embedding AS DOUBLE[]),
       |               x -> CAST(round(x * (127.0 / greatest(
       |                      list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))),
       |                      1e-30))) AS TINYINT)) AS qemb
       |           FROM embeddings),
       |     cand AS (
       |  $unions)
       |SELECT c.a, c.b,
       |       round(list_cosine_similarity(CAST(qa.qemb AS DOUBLE[]),
       |                                    CAST(qb.qemb AS DOUBLE[])), 6) AS cos_q
       |FROM cand c
       |JOIN q qa ON qa.vec_id = c.a
       |JOIN q qb ON qb.vec_id = c.b
       |WHERE round(list_cosine_similarity(CAST(qa.qemb AS DOUBLE[]),
       |                                   CAST(qb.qemb AS DOUBLE[])), 6) >= $thr
       |ORDER BY a, b""".stripMargin
  }

  /** The production ANN near-dup shape: 6 independent 6-plane tables
    * OR-ed, then exact-cosine verify on candidates only. At cos ≥ 0.9
    * (θ≈26°) a single 6-plane table recalls ~40%; OR-ing 6 tables
    * lifts that to ~95% (measured in LshRecallSpec against crafted
    * near-dup pairs — the [[dedup_embedding_cosine]] scaladoc's
    * predicted 87–98% band for 4–8 tables). Plane components are
    * plan-time literals, so the DuckDB oracle reproduces bucketing,
    * candidate union, and verification bit-for-bit.
    */
  q("sim_ann_lsh_multi", multiLshOracleSql(6, 6, 0.45)) { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    multiLshCandidatesOf(emb, nPlanes = 6, nTables = 6)
      .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea")), Seq("a"))
      .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb")), Seq("b"))
      .withColumn("cos", round(graft.functions.vec.cosine(col("ea"), col("eb")), 6))
      .filter(col("cos") >= 0.45) // synthetic corpus: random embeddings peak near cos 0.51
      .select("a", "b", "cos")
      .orderBy("a", "b") // pair set scales with dup density = input-sized
  }

  /** LSH-bucketed THRESHOLD retrieval — the registered 100 TB swap-in
    * for `sim_range_search` (AnalyticsOps), which scans the corpus
    * per probe by contract. Same output contract (probe, neighbor,
    * cos ≥ τ) but candidates come from 6 OR-ed 4-plane hyperplane
    * tables: probes' (tbl, bucket) keys — 5×6 rows, genuinely
    * bounded → broadcast — equi-join the ONE corpus bucketing pass,
    * then exact-cosine verify on candidates only. Candidate volume ∝
    * probe-bucket density, never |corpus|·|probes|. Fewer planes than
    * the near-dup rows (4 vs 6) because range search at τ = 0.3
    * (θ≈72°) needs wide buckets: per-table recall (1−θ/π)⁴ ≈ 0.13,
    * OR-6 ≈ 0.56 — the documented, DETERMINISTIC recall trade
    * (plane literals are plan-time constants, so the oracle replays
    * candidate membership exactly; the miss set is fixed, not
    * random). The brute-force row stays as the correctness baseline
    * per SCALE.md §7.
    */
  q("sim_range_search_lsh", {
    // bucket columns shared with the near-dup family (ONE bucketing
    // convention site); only the candidate join differs — probe
    // broadcast here vs a<b self-pairs there
    val (bucketCols, _) = multiLshCandCtes(4, 6)
    val unions = (0 until 6).map(t =>
      s"SELECT p.qid, e.vec_id FROM bk e JOIN pr p " +
        s"ON e.b$t = p.b$t AND e.vec_id <> p.qid").mkString("\n  UNION\n  ")
    s"""WITH bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     pr AS (SELECT vec_id AS qid, * EXCLUDE (vec_id, embedding)
       |            FROM bk WHERE vec_id IN (0, 1, 2, 3, 4)),
       |     cand AS (
       |  $unions)
       |SELECT c.qid, c.vec_id AS nbr,
       |       round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                    CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |FROM cand c
       |JOIN embeddings ea ON ea.vec_id = c.qid
       |JOIN embeddings eb ON eb.vec_id = c.vec_id
       |WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                   CAST(eb.embedding AS DOUBLE[])), 6) >= 0.30
       |ORDER BY qid, nbr""".stripMargin
  }) { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val tb = emb.select(col("vec_id"), explode(array((0 until 6).map { t =>
      struct(lit(t).as("tbl"),
        signBucketExpr(col("embedding"), 64,
          (0 until 4).map(tablePlane(t))).as("bucket"))
    }: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val probes = tb.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
      .select(col("vec_id").as("qid"), col("tbl"), col("bucket"))
    val cand = tb.join(broadcast(probes), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id")
      .distinct()
    cand
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qemb")), Seq("qid"))
      .join(emb, Seq("vec_id"))
      .withColumn("cos",
        round(graft.functions.vec.cosine(col("embedding"), col("qemb")), 6))
      .filter(col("cos") >= 0.30)
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"))
      .orderBy("qid", "nbr") // candidate-bounded output
  }

  /** k-nearest-neighbor GRAPH over the whole embedding table (k = 3)
    * — the all-vectors neighborhood structure that graph clustering,
    * SemDeDup-style analyses, and kNN classifiers consume (vs the
    * ann_* rows, which answer for a bounded probe set). Candidates
    * come from the same multi-table LSH buckets as `sim_ann_lsh_multi`
    * (equi-join on compact bucket keys, never all-pairs); each scored
    * undirected pair is mirrored into both directions AFTER the one
    * cosine pass, then a per-vector window keeps the top 3. Ranking
    * uses the 6-dp-rounded cosine with vec_id tie-break so cross-
    * engine ulps cannot flip ranks. Output ≤ 3 rows per vector =
    * input-sized → distributed sort. Vectors whose buckets yield no
    * candidate drop out (graph isolates), same on both engines.
    */
  q("sim_knn_graph", {
    val (bucketCols, unions) = multiLshCandCtes(6, 6)
    s"""WITH bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     cand AS (
       |  $unions),
       |     scored AS (
       |  SELECT c.a, c.b,
       |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.a
       |  JOIN embeddings eb ON eb.vec_id = c.b),
       |     edges AS (SELECT a AS qid, b AS nbr, cos FROM scored
       |               UNION ALL SELECT b, a, cos FROM scored),
       |     rk AS (SELECT qid, nbr, cos, CAST(row_number() OVER (
       |              PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rank
       |            FROM edges)
       |SELECT qid, nbr, cos, rank FROM rk WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin
  }) { (s, d) =>
    knnEdges(T(s, d, "embeddings").select("vec_id", "embedding"))
      .orderBy("qid", "rank") // ≤3 rows per vector = input-sized
  }

  /** Mean-reciprocal-rank retrieval eval (r16, SPEC: the standard IR
    * metric — Voorhees 1999 TREC-8 QA track): every vector queries for
    * its own label (the kNN-classifier eval shape `sim_ann_filtered`
    * set up); the ranked list is the top-10 multi-table-LSH kNN
    * neighborhood (the SAME candidate build as [[sim_knn_graph]] — one
    * definition, so a retrieval-stack tune shows up in BOTH the graph
    * and its eval), relevance = label match, and the per-query
    * reciprocal rank is 1/first-relevant-rank (0 when no relevant
    * neighbor surfaces in the top-10 — the honest miss accounting; a
    * NULL would silently shrink the denominator of any downstream
    * mean). Per-query rows = input-sized; the global MRR is a trivial
    * avg downstream — kept per-query so the gate pins every rank, not
    * one scalar.
    */
  q("eval_mrr", {
    val (bucketCols, unions) = multiLshCandCtes(6, 6)
    s"""WITH bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     cand AS (
       |  $unions),
       |     scored AS (
       |  SELECT c.a, c.b,
       |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.a
       |  JOIN embeddings eb ON eb.vec_id = c.b),
       |     edges AS (SELECT a AS qid, b AS nbr, cos FROM scored
       |               UNION ALL SELECT b, a, cos FROM scored),
       |     rk AS (SELECT qid, nbr, cos, CAST(row_number() OVER (
       |              PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rank
       |            FROM edges),
       |     rel AS (SELECT r.qid, r.rank
       |             FROM rk r
       |             JOIN embeddings q ON q.vec_id = r.qid
       |             JOIN embeddings nb ON nb.vec_id = r.nbr
       |             WHERE r.rank <= 10 AND q.label = nb.label),
       |     fr AS (SELECT qid, CAST(min(rank) AS INTEGER) AS first_rel_rank
       |            FROM rel GROUP BY qid)
       |SELECT e.vec_id AS qid, fr.first_rel_rank,
       |       round(coalesce(1.0 / fr.first_rel_rank, 0.0), 6) AS rr
       |FROM embeddings e LEFT JOIN fr ON fr.qid = e.vec_id
       |ORDER BY qid""".stripMargin
  }) { (s, d) =>
    val emb = T(s, d, "embeddings")
    val ranked = knnEdges(emb.select("vec_id", "embedding"), k = 10)
    val labels = emb.select("vec_id", "label")
    val fr = ranked
      .join(labels.select(col("vec_id").as("qid"), col("label").as("ql")), Seq("qid"))
      .join(labels.select(col("vec_id").as("nbr"), col("label").as("nl")), Seq("nbr"))
      .filter(col("ql") === col("nl"))
      .groupBy("qid")
      .agg(min("rank").cast("int").as("first_rel_rank"))
    labels.select(col("vec_id").as("qid"))
      .join(fr, Seq("qid"), "left")
      .select(col("qid"), col("first_rel_rank"),
        round(coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)), 6).as("rr"))
      .orderBy("qid") // one row per vector = input-sized
  }

  /** The shared kNN edge build (multi-table LSH candidates → cosine →
    * mirrored → top-3 per vertex). ONE definition feeds both
    * `sim_knn_graph` and `graph_pagerank`, so tuning
    * nPlanes/nTables/k can't silently desynchronize the two.
    */
  private def knnEdges(emb: DataFrame, k: Int = 3): DataFrame = {
    // r19 NOTE: the mirror union below duplicates the candidate+score
    // SUBTREE in the logical plan (two identical 28-operator branches
    // in plans/r19/sim_knn_graph_before.txt), but checkpointing scored
    // before the union was A/B'd and REGRESSED every consumer
    // (eval_mrr 0.40→1.04 s, eval_*_at_k ~2×, pagerank 3.4→3.8 s):
    // Spark's ReuseExchangeAndSubquery already deduplicates the
    // branches at execution, so the eager checkpoint only added a
    // blocking materialization job. Kept the lazy form.
    val scored = multiLshCandidatesOf(emb, nPlanes = 6, nTables = 6)
      .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea")), Seq("a"))
      .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb")), Seq("b"))
      .withColumn("cos", round(graft.functions.vec.cosine(col("ea"), col("eb")), 6))
      .select("a", "b", "cos")
    val edges = scored.select(col("a").as("qid"), col("b").as("nbr"), col("cos"))
      .unionByName(scored.select(col("b").as("qid"), col("a").as("nbr"), col("cos")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nbr").asc)
    edges
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Graph-built ANN by NN-descent (SPEC: Dong, Moses & Li 2011
    * "Efficient k-nearest neighbor graph construction for generic
    * similarity measures", WWW'11 — the construction family modern
    * graph indexes (NSW/HNSW/NSG) descend from, complementing the
    * LSH/IVF/PQ rows): seed with [[sim_knn_graph]]'s multi-table-LSH
    * top-3, then K=2 fixed refinement rounds — each round proposes
    * every neighbor-of-a-neighbor over the UNDIRECTED current graph
    * (a vector's true neighbors are likely neighbors of each other:
    * the paper's local-closure observation), scores proposals with
    * the exact rounded cosine, and keeps the best 3 per vertex from
    * (old edges ∪ proposals). Monotone by construction — a seed edge
    * is displaced only by a strictly closer vertex — so final
    * recall@k ≥ the LSH seed's (measured in LshRecallSpec against
    * brute-force truth). Determinism: fixed round count (no
    * convergence test), 6-dp-rounded cosine with nbr tie-break
    * (cross-engine ulps cannot flip ranks), and the oracle replays
    * seed + both rounds as unrolled CTEs. Scale: the edge list is
    * O(n·k) rows; a round is one self-equi-join on it (candidate
    * volume Θ(n·(2k)²), never all-pairs), two hash joins to fetch
    * embeddings, and one per-vertex top-k window — each round
    * localCheckpointed with the CC/LPA free-previous discipline.
    */
  /** One NN-descent round as unrolled oracle CTEs (shared by
    * [[sim_ann_nndescent]] and [[sim_ann_nndescent_auto]]).
    */
  private def nndRoundCtes(i: Int, prev: String): String =
    s"""u$i AS (SELECT qid, nbr FROM $prev UNION SELECT nbr, qid FROM $prev),
       |c$i AS (SELECT DISTINCT x.qid, y.nbr FROM u$i x JOIN u$i y
       |        ON y.qid = x.nbr WHERE y.nbr <> x.qid),
       |s$i AS (SELECT c.qid, c.nbr,
       |          round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                       CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |        FROM c$i c
       |        JOIN embeddings ea ON ea.vec_id = c.qid
       |        JOIN embeddings eb ON eb.vec_id = c.nbr),
       |a$i AS (SELECT qid, nbr, max(cos) AS cos FROM (
       |          SELECT qid, nbr, cos FROM s$i
       |          UNION ALL SELECT qid, nbr, cos FROM $prev) GROUP BY 1, 2),
       |e$i AS (SELECT qid, nbr, cos, rank FROM (
       |          SELECT qid, nbr, cos, CAST(row_number() OVER (
       |            PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rank
       |          FROM a$i) WHERE rank <= 3)""".stripMargin

  q("sim_ann_nndescent", {
    val (bucketCols, unions) = multiLshCandCtes(6, 6)
    def roundCtes(i: Int, prev: String): String = nndRoundCtes(i, prev)
    s"""WITH bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     cand AS (
       |  $unions),
       |     scored AS (
       |  SELECT c.a, c.b,
       |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.a
       |  JOIN embeddings eb ON eb.vec_id = c.b),
       |     edges0 AS (SELECT a AS qid, b AS nbr, cos FROM scored
       |                UNION ALL SELECT b, a, cos FROM scored),
       |     e0 AS (SELECT qid, nbr, cos FROM (
       |              SELECT qid, nbr, cos, row_number() OVER (
       |                PARTITION BY qid ORDER BY cos DESC, nbr) AS rank
       |              FROM edges0) WHERE rank <= 3),
       |${roundCtes(1, "e0")},
       |${roundCtes(2, "e1")}
       |SELECT qid, nbr, cos, rank FROM e2 ORDER BY qid, rank""".stripMargin
  }) { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    nnDescent(emb, k = 3, rounds = 2).orderBy("qid", "rank")
  }

  /** The NN-descent runner behind [[sim_ann_nndescent]] (and the
    * LshRecallSpec monotonicity probe): LSH-seeded kNN edges refined
    * by `rounds` neighbor-of-neighbor passes. Returns ≤ k rows per
    * vertex with (qid, nbr, cos, rank).
    */
  private[ops] def nnDescent(emb: DataFrame, k: Int, rounds: Int): DataFrame =
    nnDescentFrom(emb, knnEdges(emb, k).select("qid", "nbr", "cos"), k, rounds)

  /** NN-descent refinement from an EXPLICIT seed edge list (qid, nbr,
    * cos) — lets [[sim_ann_nndescent_auto]] swap the fixed-plane
    * multi-table seed for the corpus-count-derived single-table one
    * without duplicating the round machinery.
    */
  private[ops] def nnDescentFrom(emb: DataFrame, seed: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var edges = seed.localCheckpoint()
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nbr").asc)
    var out: DataFrame = null
    for (_ <- 1 to rounds) {
      val und = edges.select("qid", "nbr")
        .unionByName(edges.select(col("nbr").as("qid"), col("qid").as("nbr")))
        .distinct()
      val cand = und.as("x").join(und.as("y"), col("x.nbr") === col("y.qid"))
        .filter(col("x.qid") =!= col("y.nbr"))
        .select(col("x.qid").as("qid"), col("y.nbr").as("nbr"))
        .distinct()
      val scored = cand
        .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qe")), Seq("qid"))
        .join(emb.select(col("vec_id").as("nbr"), col("embedding").as("ne")), Seq("nbr"))
        .withColumn("cos",
          round(graft.functions.vec.cosine(col("qe"), col("ne")), 6))
        .select("qid", "nbr", "cos")
      // dedup (a pair scores identically wherever it appears) then re-rank
      val all = scored.unionByName(edges)
        .groupBy("qid", "nbr").agg(max("cos").as("cos"))
      val prev = edges
      out = all.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .localCheckpoint()
      edges = out.select("qid", "nbr", "cos")
      prev.unpersist(false)
    }
    out
  }

  /** Int8 scalar-quantized ANN (SPEC: the standard sq8 compression in
    * FAISS/ScaNN-class systems): per-vector symmetric quantization
    * q_i = round(x_i · 127/max|x|) stored as TINYINT — 4× less scan IO
    * and shuffle width than float32, the difference between an
    * in-memory and a spilling candidate join at 100 TB. Cosine is
    * scale-invariant, so the per-vector scale needs no storage and the
    * only fidelity loss is rounding (|Δcos| ≤ ~0.01 at dim 64, asserted
    * in LshRecallSpec). Candidates come from the same hyperplane
    * buckets as sim_ann_lsh; ranking runs entirely on the quantized
    * vectors. Quantization is oracle-exact: the native expression
    * rounds half-away-from-zero by explicit fractional-part compare,
    * matching DuckDB's `round` on every double. The int products/sums
    * stay exact in doubles too; the one remaining divergence is
    * `sqrt(na·nb)` here vs `sqrt(na)·sqrt(nb)` in DuckDB's
    * list_cosine_similarity — an ulp-level gap that round-to-6 on both
    * sides absorbs, so the compared cosines are round-6-identical, not
    * bit-identical.
    */
  q("sim_ann_quantized",
    s"""WITH q AS (
       |  SELECT vec_id, ${bucketSql(8)} AS bucket,
       |         list_transform(CAST(embedding AS DOUBLE[]),
       |           x -> CAST(round(x * (127.0 / greatest(
       |                  list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))),
       |                  1e-30))) AS TINYINT)) AS qemb
       |  FROM embeddings),
       |     j AS (SELECT l.vec_id AS qid, r.vec_id AS nbr,
       |                  round(list_cosine_similarity(CAST(l.qemb AS DOUBLE[]),
       |                                               CAST(r.qemb AS DOUBLE[])), 6) AS cos_q
       |           FROM q l JOIN q r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id)
       |SELECT qid, nbr, cos_q, rn FROM (
       |  SELECT qid, nbr, cos_q,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_q DESC, nbr) AS INTEGER) AS rn
       |  FROM j) t
       |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin) { (s, d) =>
    val b = quantized(lshBucketed(s, d, nPlanes = 8))
    val l = b.select(col("bucket"), col("vec_id").as("qid"), col("qemb").as("qa"))
    val r = b.select(col("bucket"), col("vec_id").as("nbr"), col("qemb").as("qb"))
    val w = Window.partitionBy("qid").orderBy(col("cos_q").desc, col("nbr").asc)
    // vec_cosine reads array<tinyint> natively — no per-pair widening
    // to double arrays, and the join shuffles 1-byte elements
    l.join(r, Seq("bucket"))
      .filter(col("qid") =!= col("nbr"))
      .withColumn("cos_q",
        round(graft.functions.vec.cosine(col("qa"), col("qb")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("qid", "nbr", "cos_q", "rn")
      .orderBy("qid", "rn") // top-k PER VECTOR = input-sized
  }

  /** SemDeDup (SPEC: Abbas et al. 2023 — semantic deduplication:
    * cluster embedding-space near-duplicates and keep one
    * representative per cluster; the curation step that removes
    * paraphrase/translation duplicates exact and MinHash dedup cannot
    * see): multi-table LSH candidates → exact-cosine verify (the
    * sim_ann_lsh_multi pair pipeline) → distributed connected
    * components over the verified pair graph → lowest vec_id as the
    * cluster canonical. Reuses [[connectedComponents]] (iterative
    * min-label, per-round localCheckpoint), so the CC cost is
    * O(rounds × pair-graph), never corpus².
    */
  q("dedup_semantic_cluster", {
    val (bucketCols, unions) = multiLshCandCtes(6, 6)
    s"""WITH RECURSIVE bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     cand AS (
       |  $unions),
       |     pairs AS (
       |  SELECT c.a, c.b FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.a
       |  JOIN embeddings eb ON eb.vec_id = c.b
       |  WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                     CAST(eb.embedding AS DOUBLE[])), 6) >= 0.45),
       |     edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
       |     reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       |     comp AS (
       |  SELECT src AS vec_id, least(src, min(dst)) AS canonical FROM reach GROUP BY src)
       |SELECT vec_id, canonical FROM comp ORDER BY vec_id""".stripMargin
  }) { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val pairs = multiLshCandidatesOf(emb, nPlanes = 6, nTables = 6)
      .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea")), Seq("a"))
      .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb")), Seq("b"))
      .filter(round(graft.functions.vec.cosine(col("ea"), col("eb")), 6) >= 0.45)
      .select("a", "b")
    connectedComponents(pairs)
      .select(col("id").as("vec_id"), col("lbl").as("canonical"))
      .orderBy("vec_id") // one row per clustered vector = dup-density-sized
  }

  /** SemDeDup KEEP-LIST (r17 — the scale-safe companion the pair-set
    * rows' scaladoc promised: [[dedup_semantic_cluster]] emits the
    * cluster map, THIS row emits the enforced keep/drop DECISION for
    * every corpus vector, linear output by construction; SPEC: Abbas
    * et al. 2023 SemDeDup §3 — keep one representative per semantic
    * cluster). Pipeline: (1) EXACT-DUPLICATE COLLAPSE — group vectors
    * by identical embedding content, representative = min vec_id per
    * group. Exact, not approximate: identical embeddings land in the
    * same LSH bucket in every table and score the same cosine against
    * every third vector, so each dup group is a clique sharing all
    * external edges; replacing the group by its rep + (member → rep)
    * edges preserves connected components and each component's min id
    * verbatim. This is what bounds the planted mega-dup cluster —
    * 50k copies contribute ONE rep to the pair join (Θ(n) member
    * edges) where the raw pair graph is Θ(copies²). (2) The
    * [[dedup_semantic_cluster]] machinery on reps only: multi-table
    * LSH candidates → exact-cosine verify ≥ 0.45 → distributed CC.
    * (3) Decision join: every vector gets (canonical, keep) with
    * keep ⇔ vec_id == canonical — unclustered vectors keep themselves.
    * Output is EXACTLY corpus-sized; the oracle replays the
    * uncollapsed semantics (same components, proven above). The dup:
    * StressProbe pins the law: output rows == n at every planted
    * copy count while dedup_embedding_cosine's pair set is
    * Θ(copies²) by contract.
    */
  q("dedup_semdedup_keep", {
    val (bucketCols, unions) = multiLshCandCtes(6, 6)
    s"""WITH RECURSIVE bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     cand AS (
       |  $unions),
       |     pairs AS (
       |  SELECT c.a, c.b FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.a
       |  JOIN embeddings eb ON eb.vec_id = c.b
       |  WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                     CAST(eb.embedding AS DOUBLE[])), 6) >= 0.45),
       |     edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
       |     reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       |     comp AS (
       |  SELECT src AS vec_id, least(src, min(dst)) AS canonical
       |  FROM reach GROUP BY src)
       |SELECT e.vec_id, coalesce(comp.canonical, e.vec_id) AS canonical,
       |       coalesce(comp.canonical, e.vec_id) = e.vec_id AS keep
       |FROM embeddings e LEFT JOIN comp ON comp.vec_id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin
  }) { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    // (1) exact-dup collapse: one rep per distinct embedding payload.
    // ONE whole-partition window on the payload key (n rows shuffled
    // once) instead of groupBy + re-join on the array (2n + 2d rows
    // across three exchanges); a mega-dup group buffers in one window
    // partition, which min() handles in a single pass — the 200k-copy
    // probe rides this path
    val wEmb = Window.partitionBy("embedding")
    val member = emb.withColumn("rep", min("vec_id").over(wEmb))
      .localCheckpoint() // reps + dupEdges both read it; cut the double window
    val reps = member.filter(col("vec_id") === col("rep"))
      .select(col("vec_id"), col("embedding"))
    // (2) pair graph on reps only + member→rep edges (cos = 1 exact)
    val repPairs = multiLshCandidatesOf(reps, nPlanes = 6, nTables = 6)
      .join(reps.select(col("vec_id").as("a"), col("embedding").as("ea")), Seq("a"))
      .join(reps.select(col("vec_id").as("b"), col("embedding").as("eb")), Seq("b"))
      .filter(round(graft.functions.vec.cosine(col("ea"), col("eb")), 6) >= 0.45)
      .select("a", "b")
    val dupEdges = member.filter(col("vec_id") =!= col("rep"))
      .select(col("vec_id").as("a"), col("rep").as("b"))
    val cc = connectedComponents(repPairs.unionByName(dupEdges))
    // (3) corpus-sized decision
    emb.select("vec_id")
      .join(cc.select(col("id").as("vec_id"), col("lbl").as("cl")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cl"), col("vec_id")).as("canonical"),
        (coalesce(col("cl"), col("vec_id")) === col("vec_id")).as("keep"))
      .orderBy("vec_id") // one row per vector = corpus-sized, NEVER pair-sized
  }

  /** The production composition of the two ANN upgrades: multi-table
    * OR-amplified candidates (recall 87–98% at the near-dup threshold,
    * LshRecallSpec) verified on int8-quantized vectors (4× narrower
    * verify shuffle). Candidates are IDENTICAL to sim_ann_lsh_multi by
    * construction — bucketing runs on the float embeddings; only the
    * verify arithmetic is quantized — so the recall band carries over
    * unchanged (asserted in LshRecallSpec) and the shuffles that scale
    * with candidate count move 1-byte elements.
    */
  q("sim_ann_quantized_multi", quantizedMultiOracleSql(6, 6, 0.45)) { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val q8 = quantized(emb).select(col("vec_id"), col("qemb"))
    multiLshCandidatesOf(emb, nPlanes = 6, nTables = 6)
      .join(q8.select(col("vec_id").as("a"), col("qemb").as("qa")), Seq("a"))
      .join(q8.select(col("vec_id").as("b"), col("qemb").as("qb")), Seq("b"))
      .withColumn("cos_q", round(graft.functions.vec.cosine(col("qa"), col("qb")), 6))
      .filter(col("cos_q") >= 0.45)
      .select("a", "b", "cos_q")
      .orderBy("a", "b") // pair set scales with dup density = input-sized
  }

  /** Adds `qemb`: the int8 symmetric scalar quantization of
    * `embedding` via the native codegen'd expression — one pass, no
    * interpreted lambda plumbing, no shuffle.
    */
  private[ops] def quantized(df: DataFrame): DataFrame =
    df.withColumn("qemb", graft.functions.vec.quantize8(col("embedding")))

  /** The multiLshCandidatesOf scaling law MADE EXECUTABLE:
    * nPlanes ≈ log₂(n / targetBucketSize), clamped to [4, 24] — fixed
    * plane counts keep candidate volume Θ(n²/2^planes), i.e. still
    * asymptotically quadratic; deriving planes from the corpus count
    * pins EXPECTED bucket occupancy at ~targetBucketSize so candidate
    * volume stays Θ(n·target) at ANY corpus size (10¹⁰ vectors derive
    * ~26→24 planes). Deterministic in n, so the data-parameterized
    * oracle replays the same derivation from the same count.
    */
  private[ops] def autoPlanes(n: Long, targetBucket: Int = 16): Int = {
    require(n > 0, "autoPlanes: empty corpus")
    val raw = math.round(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt
    math.max(4, math.min(24, raw))
  }

  /** Corpus-sized-planes ANN near-dup: `dedup_embedding_cosine` with
    * nPlanes DERIVED from the corpus count instead of a fixed demo
    * constant (the r11 verdict's "prove the scaling law is executable,
    * not prose"). The count is one cheap metadata-ish job at plan-build
    * time (a plan constant, the BPE-artifact pattern); the derived
    * plane count rides the output as `n_planes` so the gate at
    * different SFs proves DIFFERENT derivations hash-green (sf0.01:
    * 500 vecs → 5 planes; sf0.1: 2000 → 7). Bucket-occupancy stats for
    * the law are pinned in LshRecallSpec.
    */
  qDyn("sim_ann_lsh_auto") { (s, d) =>
    val n = T(s, d, "embeddings").count()
    val nPlanes = autoPlanes(n)
    val b = lshBucketed(s, d, nPlanes)
    val l = b.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ua"))
    val r = b.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("ub"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos",
        round(graft.functions.vec.cosine(col("ua"), col("ub")), 6))
      .filter(col("cos") >= 0.45)
      .select(col("a"), col("b"), col("cos"), lit(nPlanes).as("n_planes"))
      .distinct()
      .orderBy("a", "b") // input-sized
  } { (s, d) =>
    val n = T(s, d, "embeddings").count()
    val nPlanes = autoPlanes(n)
    s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql(nPlanes)} AS bucket FROM embeddings)
       |SELECT DISTINCT l.vec_id AS a, r.vec_id AS b,
       |       round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
       |                                    CAST(r.embedding AS DOUBLE[])), 6) AS cos,
       |       $nPlanes AS n_planes
       |FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
       |WHERE round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
       |                                   CAST(r.embedding AS DOUBLE[])), 6) >= 0.45
       |ORDER BY a, b""".stripMargin
  }

  /** NN-descent with the PRODUCTION seed (r13 verdict #3 — the one
    * superlinear edge removed from the registered surface):
    * [[sim_ann_nndescent]]'s refinement rounds over a seed whose plane
    * count derives from the corpus count ([[autoPlanes]], the
    * [[sim_ann_lsh_auto]] scaling law) instead of knnEdges' fixed
    * 6-plane multi-table demo constant — candidate volume Θ(n·16) at
    * ANY corpus size, vs Θ(n²/2⁶) for the fixed seed. One single-table
    * bucket join seeds top-3 edges per vertex; two neighbor-of-neighbor
    * rounds refine on the O(n·k) edge list exactly as the fixed-seed
    * row does (shared [[nnDescentFrom]] machinery, CC-style
    * localCheckpoint discipline). Data-parameterized oracle: the SQL is
    * BUILT from the same derived plane count, so the gate at different
    * SFs replays DIFFERENT derivations (sf0.01: 5 planes; sf0.1: 7) —
    * `n_planes` rides the output to prove it. Recall monotonicity over
    * this seed is pinned in LshRecallSpec alongside the fixed-seed row.
    */
  qDyn("sim_ann_nndescent_auto") { (s, d) =>
    val n = T(s, d, "embeddings").count()
    val nPlanes = autoPlanes(n)
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val b = lshBucketed(s, d, nPlanes)
    val l = b.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ua"))
    val r = b.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("ub"))
    val pairs = l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos", round(graft.functions.vec.cosine(col("ua"), col("ub")), 6))
      .select("a", "b", "cos")
      .distinct() // a pair may collide in one bucket only (single table)
    val mirrored = pairs.select(col("a").as("qid"), col("b").as("nbr"), col("cos"))
      .unionByName(pairs.select(col("b").as("qid"), col("a").as("nbr"), col("cos")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nbr").asc)
    val seed = mirrored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3).select("qid", "nbr", "cos")
    nnDescentFrom(emb, seed, k = 3, rounds = 2)
      .withColumn("n_planes", lit(nPlanes))
      .orderBy("qid", "rank") // ≤3 rows per vector = input-sized
  } { (s, d) =>
    val n = T(s, d, "embeddings").count()
    val nPlanes = autoPlanes(n)
    s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql(nPlanes)} AS bucket
       |            FROM embeddings),
       |     scored AS (
       |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b,
       |         round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
       |                                      CAST(r.embedding AS DOUBLE[])), 6) AS cos
       |  FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
       |     edges0 AS (SELECT a AS qid, b AS nbr, cos FROM scored
       |                UNION ALL SELECT b, a, cos FROM scored),
       |     e0 AS (SELECT qid, nbr, cos FROM (
       |              SELECT qid, nbr, cos, row_number() OVER (
       |                PARTITION BY qid ORDER BY cos DESC, nbr) AS rank
       |              FROM edges0) WHERE rank <= 3),
       |${nndRoundCtes(1, "e0")},
       |${nndRoundCtes(2, "e1")}
       |SELECT qid, nbr, cos, rank, $nPlanes AS n_planes FROM e2
       |ORDER BY qid, rank""".stripMargin
  }

  /** Per-label centroid cosine — embedding-quality/outlier scoring:
    * learn each label's mean vector, then score every vector's cosine
    * against its own label's centroid (low score = mislabeled or
    * outlier candidate; the standard embedding-space QA pass before
    * training on labeled pairs). Two-phase by design for scale:
    * (1) TRAIN — posexplode to (label, pos, x) rows and two-phase
    * avg: n·dim compact rows but map-side partial aggregation, one
    * shuffle on (label, pos) keys, output is the O(labels × dim)
    * centroid table; (2) SCORE — centroids pack back to one array per
    * label (array_sort(collect_list(struct(pos, c)))), BROADCAST onto
    * the embeddings scan, and the dot/norm is a map-side in-order
    * zip_with fold — no per-vector shuffle, and the left-fold order
    * matches the oracle's list_reduce exactly so the only cross-engine
    * noise is the centroid avg itself (washed out by round 6).
    */
  q("sim_centroid_outlier",
    """WITH pos AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
      |                    unnest(range(1, len(embedding)+1)) AS p FROM embeddings),
      |     cent AS (SELECT label, p, avg(x) AS c FROM pos GROUP BY 1, 2),
      |     carr AS (SELECT label, list(c ORDER BY p) AS cent FROM cent GROUP BY 1)
      |SELECT e.vec_id, e.label,
      |  round(
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(list_zip(e.embedding, ca.cent), z -> CAST(z[1] AS DOUBLE) * z[2])),
      |      (a, b) -> a + b)
      |    / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |        (a, b) -> a + b))
      |       * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |           list_transform(ca.cent, c -> c * c)), (a, b) -> a + b))), 6) AS cos_centroid
      |FROM embeddings e JOIN carr ca ON ca.label = e.label
      |ORDER BY vec_id""") { (s, d) =>
    val emb = T(s, d, "embeddings")
    val cent = emb
      .select(col("label"), posexplode(col("embedding")))
      .withColumnRenamed("pos", "p")
      .withColumn("x", col("col").cast("double"))
      .groupBy("label", "p").agg(avg("x").as("c"))
    val packed = cent.groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("p"), col("c")))),
        s => s.getField("c")).as("cent"))
    val dot = aggregate(
      zip_with(col("embedding"), col("cent"), (x, c) => x.cast("double") * c),
      lit(0.0), (a, b) => a + b)
    val nx = aggregate(
      transform(col("embedding"), x => x.cast("double") * x.cast("double")),
      lit(0.0), (a, b) => a + b)
    val nc = aggregate(
      transform(col("cent"), c => c * c), lit(0.0), (a, b) => a + b)
    emb.join(broadcast(packed), Seq("label"))
      .select(col("vec_id"), col("label"),
        round(dot / (sqrt(nx) * sqrt(nc)), 6).as("cos_centroid"))
      .orderBy("vec_id") // one row per vector = input-sized
  }

  // -------------------------------------------------------- text analysis

  q("text_stats",
    """SELECT lang, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
      |FROM (SELECT lang, unnest(str_split(text, ' ')) AS tok FROM documents) t
      |GROUP BY lang ORDER BY lang""") { (s, d) =>
    T(s, d, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_distinct"))
      .reportSorted("lang")
  }

  // top bigrams per language: the n-gram term-frequency shape (SURVEY
  // §2.L text_stats "n-gram counts") — shingle map-side, one count
  // shuffle, top-k per group via window (no global sort).
  q("text_ngram_freq",
    """SELECT lang, ngram, n FROM (
      |  SELECT lang, ngram, n,
      |         row_number() OVER (PARTITION BY lang ORDER BY n DESC, ngram) AS rn
      |  FROM (
      |    SELECT lang, ngram, count(*) AS n FROM (
      |      SELECT lang, tok[i] || ' ' || tok[i+1] AS ngram
      |      FROM (SELECT lang, str_split(text, ' ') AS tok FROM documents) t1,
      |           unnest(generate_series(1, len(tok) - 1)) AS u(i)) t2
      |    GROUP BY lang, ngram) t3) t4
      |WHERE rn <= 5 ORDER BY lang, n DESC, ngram""") { (s, d) =>
    // zip_with over two shifted slices, NOT transform(sequence(...), i ->
    // tok[i]): per-element array indexing through the lambda plumbing
    // measured 5× slower than the pairwise zip at sf0.1. Single-token
    // docs get two empty slices → no bigrams (no ANSI out-of-bounds).
    val tok = split(col("text"), " ")
    val n1 = greatest(size(tok) - 1, lit(0))
    val bigrams = T(s, d, "documents")
      .select(col("lang"), explode(zip_with(
        slice(tok, lit(1), n1), slice(tok, lit(2), n1),
        (x, y) => concat(x, lit(" "), y))).as("ngram"))
    val counts = bigrams.groupBy("lang", "ngram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("ngram").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("lang", "ngram", "n")
      .reportSorted(col("lang"), col("n").desc, col("ngram"))
  }

  q("text_filter_lang",
    """SELECT doc_id, n_chars FROM documents
      |WHERE lang = 'en' AND n_chars BETWEEN 100 AND 400 ORDER BY doc_id""") { (s, d) =>
    T(s, d, "documents")
      .filter(col("lang") === "en" && col("n_chars").between(100, 400))
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  q("text_token_count",
    """SELECT doc_id, CAST(len(str_split(text, ' ')) AS INTEGER) AS ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpe_ish
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    // whitespace count + a BPE-ish regex segmentation (letters/digits/other)
    T(s, d, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("bpe_ish"))
      .orderBy("doc_id")
  }

  q("text_quality",
    """SELECT doc_id,
      |       round(CAST(n_chars AS DOUBLE) / greatest(len(str_split(text, ' ')), 1), 6) AS avg_tok_len,
      |       round(CAST(len(list_filter(str_split(text, ' '),
      |             t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
      |             / greatest(len(str_split(text, ' ')), 1), 6) AS stopword_ratio,
      |       round(CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
      |             / greatest(n_chars, 1), 6) AS punct_ratio
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    val toks = split(col("text"), " ")
    T(s, d, "documents")
      .select(col("doc_id"),
        round(col("n_chars").cast("double") / greatest(size(toks), lit(1)), 6)
          .as("avg_tok_len"),
        round(size(filter(toks, t => t.isin("the", "a", "and", "of", "to"))).cast("double")
          / greatest(size(toks), lit(1)), 6).as("stopword_ratio"),
        round(size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)")).cast("double")
          / greatest(col("n_chars"), lit(1)), 6).as("punct_ratio"))
      .orderBy("doc_id")
  }

  /** Flesch reading-ease readability (SPEC: Flesch 1948, the
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) form
    * used by readability gates in data-quality stacks): sentences =
    * terminal-punctuation runs (min 1), syllables ≈ vowel groups —
    * the standard dictionary-free approximation. Pure per-row regex
    * counting, zero shuffle, embarrassingly parallel at 100 TB; the
    * integer counts make the arithmetic bit-identical cross-engine
    * (one round(·,6) on the final per-row score, no aggregation
    * follows — checklist rule 5, not 12).
    */
  q("text_readability",
    """SELECT doc_id,
      |       CAST(len(str_split(text, ' ')) AS BIGINT) AS words,
      |       CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS sentences,
      |       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syllables,
      |       round(206.835
      |             - 1.015 * (CAST(len(str_split(text, ' ')) AS DOUBLE)
      |                        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
      |             - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
      |                       / greatest(len(str_split(text, ' ')), 1)), 6) AS flesch
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    val words = size(split(col("text"), " ")).cast("long")
    val sents = greatest(
      size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1)).cast("long")
    val syls = size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")).cast("long")
    T(s, d, "documents")
      .select(col("doc_id"),
        words.as("words"), sents.as("sentences"), syls.as("syllables"),
        round(lit(206.835)
          - lit(1.015) * (words.cast("double") / sents)
          - lit(84.6) * (syls.cast("double") / greatest(words, lit(1L))), 6)
          .as("flesch"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Repetition quality signals (SPEC: Gopher/MassiveText repetition
    * filters — Rae et al. 2021 §A1.1: documents dominated by a single
    * token or by duplicated n-grams are boilerplate/spam): per doc,
    * the fraction of tokens taken by the most frequent word and the
    * fraction of word-bigrams that are repeats. top_word_frac computes
    * via explode → two-phase (doc, word) count — map-side combine keeps
    * the shuffle proportional to DISTINCT words per doc, not tokens;
    * dup_bigram_frac is pure per-row HOF work (zip_with shifted slices
    * + array_distinct), zero shuffle. At 100 TB both signals stay one
    * pass over the corpus.
    */
  q("text_quality_repetition",
    """SELECT w.doc_id,
      |       round(CAST(max(w.c) AS DOUBLE) / sum(w.c), 6) AS top_word_frac,
      |       round(any_value(CASE WHEN len(w.bg) = 0 THEN 0.0
      |         ELSE 1.0 - CAST(len(list_distinct(w.bg)) AS DOUBLE) / len(w.bg) END), 6)
      |         AS dup_bigram_frac
      |FROM (
      |  SELECT doc_id, u.tok AS word, count(*) AS c,
      |         any_value(list_transform(generate_series(1, len(t) - 1),
      |                   i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents) d1,
      |       unnest(t) AS u(tok)
      |  GROUP BY doc_id, u.tok) w
      |GROUP BY w.doc_id ORDER BY w.doc_id""") { (s, d) =>
    val tok = split(col("text"), " ")
    val n1 = greatest(size(tok) - 1, lit(0))
    val bigrams = zip_with(
      slice(tok, lit(1), n1), slice(tok, lit(2), n1),
      (x, y) => concat(x, lit(" "), y))
    val perDoc = T(s, d, "documents").select(
      col("doc_id"),
      explode(tok).as("word"),
      // carried through the agg untouched: one value per doc
      when(size(bigrams) === 0, 0.0)
        .otherwise(lit(1.0) -
          size(array_distinct(bigrams)).cast("double") / size(bigrams))
        .as("dupf"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("c"), first("dupf").as("dupf"))
    perDoc.groupBy("doc_id")
      .agg(round(max("c").cast("double") / sum("c"), 6).as("top_word_frac"),
        round(first("dupf"), 6).as("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  /** TF-IDF keyword extraction — top-3 characteristic terms per doc
    * (the classic retrieval/labeling primitive): tf = in-doc count,
    * idf = ln(N/df). Two vocab-sized shuffles ((doc,word) counts and
    * document frequencies), the df/N table joins back onto the per-doc
    * counts (AQE broadcasts it while it fits, shuffle-joins beyond —
    * no hard driver pin at any vocabulary size), top-3 via a window
    * over the (doc,word) count frame — nothing token-sized ever
    * shuffles twice, nothing corpus-sized sorts globally.
    */
  /** MinHash band-plan calculator (SPEC: Leskovec/Rajaraman/Ullman
    * "Mining of Massive Datasets" §3.4.3 — the S-curve 1−(1−s^r)^b and
    * its threshold midpoint (1/b)^(1/r); the tuning table every
    * banded-LSH deployment derives before committing a (bands, rows)
    * split): for k = 128 minhashes, enumerate every divisor split and
    * score it against target Jaccard thresholds — collision
    * probability AT the target and the curve midpoint; `chosen` marks
    * the split whose midpoint lands nearest the target (tie → fewer
    * rows per band = recall-leaning). The executable form of the
    * dedup_near_minhash scaladoc's sizing discussion — the
    * [[sim_ann_lsh_auto]] discipline applied to the banding knob.
    * Pure plan-time math (no data scan); comparisons run on round-6
    * values so cross-engine pow() ulps cannot flip the argmin.
    */
  q("pipeline_minhash_band_tuning",
    """WITH rs AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128]) AS r),
      |br AS (SELECT r, 128 // r AS b FROM rs),
      |ts AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS t),
      |sc AS (
      |  SELECT ts.t, br.b, br.r,
      |         round(1.0 - power(1.0 - power(ts.t, br.r), br.b), 6) AS p_collision,
      |         round(power(1.0 / br.b, 1.0 / br.r), 6) AS s_mid
      |  FROM ts CROSS JOIN br),
      |rk AS (
      |  SELECT t, b, r, p_collision, s_mid,
      |         row_number() OVER (PARTITION BY t
      |           ORDER BY abs(s_mid - t), r) AS rn
      |  FROM sc)
      |SELECT CAST(t AS DOUBLE) AS target_t, CAST(b AS INTEGER) AS bands,
      |       CAST(r AS INTEGER) AS rows_per_band, p_collision, s_mid,
      |       rn = 1 AS chosen
      |FROM rk ORDER BY target_t, rows_per_band""".stripMargin) { (s, d) =>
    import s.implicits._
    val rs = Seq(1, 2, 4, 8, 16, 32, 64, 128).toDF("r")
      .withColumn("b", (lit(128) / col("r")).cast("int"))
    val ts = Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("t")
    val sc = ts.crossJoin(rs)
      .select(col("t"), col("b"), col("r"),
        round(lit(1.0) - pow(lit(1.0) - pow(col("t"), col("r")), col("b")), 6)
          .as("p_collision"),
        round(pow(lit(1.0) / col("b"), lit(1.0) / col("r")), 6).as("s_mid"))
    val w = Window.partitionBy("t")
      .orderBy(abs(col("s_mid") - col("t")).asc, col("r").asc)
    sc.withColumn("rn", row_number().over(w))
      .select(col("t").as("target_t"), col("b").cast("int").as("bands"),
        col("r").cast("int").as("rows_per_band"),
        col("p_collision"), col("s_mid"), (col("rn") === 1).as("chosen"))
      .orderBy("target_t", "rows_per_band") // 40 rows = constant-sized
  }

  /** RAKE keyword extraction per document (SPEC: Rose, Engel, Cramer &
    * Cowley 2010 "Automatic keyword extraction from individual
    * documents" — the stopword-delimited co-occurrence scorer that
    * needs no corpus statistics, complementing [[text_tfidf_topk]]'s
    * corpus-relative ranking): candidate phrases are maximal runs of
    * non-stopwords; word score = deg(w)/freq(w) where deg sums the
    * lengths of phrases each occurrence sits in (the paper's
    * co-occurrence degree) and freq counts occurrences; a phrase
    * scores the sum of its word scores; top-3 phrases per doc.
    * Determinism: each word ratio snaps to the dy20 grid BEFORE the
    * phrase sum (rule 12 — grid multiples sum exactly in any
    * association order), ranking ties break (phrase asc, first
    * occurrence asc), display rounds once (rule 5). Phrase grouping is
    * the gaps-and-islands trick (running stopword count = island id) —
    * one window pass per doc; every subsequent groupBy/join is keyed
    * on doc_id (+word/island), so at 100 TB the stages co-partition on
    * the doc hash and the top-k window rides the same exchange.
    */
  q("text_keyword_rake", {
    val stopsSql = "('a','the','and','of','to','in','is','on')"
    s"""WITH w0 AS (
       |  SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS pos
       |  FROM (SELECT doc_id,
       |          [x FOR x IN string_split(coalesce(text, ''), ' ') IF x <> ''] AS ws
       |        FROM documents) t),
       |wrd AS (
       |  SELECT doc_id, pos, ws[pos] AS w, ws[pos] IN $stopsSql AS is_stop
       |  FROM w0),
       |isl AS (
       |  SELECT doc_id, pos, w, is_stop,
       |         sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS pid
       |  FROM wrd),
       |phw AS (SELECT doc_id, pos, w, pid FROM isl WHERE NOT is_stop),
       |phr AS (
       |  SELECT doc_id, pid, string_agg(w, ' ' ORDER BY pos) AS phrase,
       |         count(*) AS plen
       |  FROM phw GROUP BY 1, 2),
       |wst AS (
       |  SELECT s.doc_id, s.w, sum(p.plen) AS deg, count(*) AS freq
       |  FROM phw s JOIN phr p ON p.doc_id = s.doc_id AND p.pid = s.pid
       |  GROUP BY 1, 2),
       |psc AS (
       |  SELECT s.doc_id, s.pid,
       |         sum(${Grid.dy20Sql("CAST(t.deg AS DOUBLE) / t.freq")}) AS score
       |  FROM phw s JOIN wst t ON t.doc_id = s.doc_id AND t.w = s.w
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT p.doc_id, p.phrase, CAST(p.plen AS INTEGER) AS n_words, c.score,
       |         CAST(row_number() OVER (PARTITION BY p.doc_id
       |           ORDER BY c.score DESC, p.phrase, p.pid) AS INTEGER) AS rank
       |  FROM phr p JOIN psc c ON c.doc_id = p.doc_id AND c.pid = p.pid)
       |SELECT doc_id, rank, phrase, n_words, round(score, 6) AS score
       |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
  }) { (s, d) =>
    val stops = Seq("a", "the", "and", "of", "to", "in", "is", "on")
    val words = T(s, d, "documents")
      .select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), " ")).as(Seq("pos0", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("is_stop", col("w").isInCollection(stops))
    val wp = Window.partitionBy("doc_id").orderBy("pos0")
    val isl = words
      .withColumn("pid", sum(when(col("is_stop"), 1L).otherwise(0L)).over(wp))
    val phw = isl.filter(!col("is_stop"))
      .select("doc_id", "pos0", "w", "pid")
    // phrase-sized collect: bounded by a stopword-free run, never a doc
    val phr = phw.groupBy("doc_id", "pid")
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(pos0, w))), x -> x.w), ' ')")
          .as("phrase"),
        count(lit(1)).as("plen"))
    val wst = phw
      .join(phr.select(col("doc_id"), col("pid"), col("plen")), Seq("doc_id", "pid"))
      .groupBy("doc_id", "w")
      .agg(sum("plen").as("deg"), count(lit(1)).as("freq"))
    val psc = phw
      .join(wst, Seq("doc_id", "w"))
      .groupBy("doc_id", "pid")
      .agg(sum(Grid.dy20(col("deg").cast("double") / col("freq"))).as("score"))
    val rw = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("phrase").asc, col("pid").asc)
    phr.join(psc, Seq("doc_id", "pid"))
      .withColumn("rank", row_number().over(rw).cast("int"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("phrase"),
        col("plen").cast("int").as("n_words"), round(col("score"), 6).as("score"))
      .orderBy("doc_id", "rank") // ≤3 rows per doc = input-sized
  }

  q("text_tfidf_topk",
    """WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents),
      |     tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
      |     df AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |     n AS (SELECT count(*) AS n FROM documents)
      |SELECT doc_id, w, score, rn FROM (
      |  SELECT tf.doc_id, tf.w,
      |         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score,
      |         CAST(row_number() OVER (PARTITION BY tf.doc_id
      |           ORDER BY round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) DESC, tf.w)
      |           AS INTEGER) AS rn
      |  FROM tf JOIN df USING (w) CROSS JOIN n) t
      |WHERE rn <= 3 ORDER BY doc_id, rn""") { (s, d) =>
    val tok = T(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("w").agg(countDistinct("doc_id").as("df"))
    val n = T(s, d, "documents").agg(count(lit(1)).as("n"))
    val score = col("tf") * log(col("n").cast("double") / col("df"))
    // rank on the ROUNDED score: the engines' ln() may differ at the
    // ulp level, and a sub-1e-6 gap between two words must collapse to
    // the deterministic word tie-break on both sides, not flip ranks
    val w = Window.partitionBy("doc_id").orderBy(round(score, 6).desc, col("w").asc)
    // NO broadcast() hint on the vocab-sized df table: a hint is a hard
    // pin that would OOM the driver on an open-web vocabulary (10⁸+
    // distinct tokens). AQE broadcasts it at runtime whenever the
    // materialized size clears autoBroadcastJoinThreshold (plan-asserted
    // in PlanInvariantsSpec) and falls back to a shuffle join above it —
    // the size gate belongs to the engine, not the query.
    tf.join(df, Seq("w"))
      .crossJoin(broadcast(n))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("w"), round(score, 6).as("score"), col("rn"))
      .orderBy("doc_id", "rn") // top-3 per doc = input-sized
  }

  /** Unigram-LM quality scoring (SPEC: the CCNet-style perplexity
    * filter — Wenzek et al. 2020 score docs by per-token negative
    * log-likelihood under a corpus LM; high NLL = out-of-distribution
    * or gibberish, the standard quality gate before dedup). The LM
    * here is the corpus's own unigram distribution — the KenLM slot a
    * production pipeline fills with a reference-corpus model.
    * TRAIN: explode → two-phase word count (shuffle is vocab-sized).
    * SCORE: the logprob table joins onto the token stream — AQE
    * broadcasts it while it fits (map-side probability lookup, no
    * token-level shuffle; plan-asserted), shuffle-joins on an
    * open-web vocabulary rather than pinning driver state — then one
    * two-phase per-doc avg. At 100 TB every shuffle is vocab- or
    * doc-sized, never token-sized.
    */
  q("text_unigram_logprob",
    """WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents),
      |     lm AS (SELECT w, ln(CAST(count(*) AS DOUBLE) /
      |                         (SELECT count(*) FROM tok)) AS lp
      |            FROM tok GROUP BY w)
      |SELECT t.doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
      |       round(-avg(lm.lp), 6) AS avg_nll
      |FROM tok t JOIN lm ON lm.w = t.w
      |GROUP BY t.doc_id ORDER BY t.doc_id""") { (s, d) =>
    val tok = T(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val total = tok.agg(count(lit(1)).as("tot"))
    val lm = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total))
      .select(col("w"), log(col("c") / col("tot")).as("lp"))
    // vocab-sized lm table: no broadcast() hint — AQE broadcasts below
    // the size threshold, shuffle-joins above (same rationale as
    // text_tfidf_topk; the one-row `total` broadcast above stays pinned)
    tok.join(lm, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        round(-avg("lp"), 6).as("avg_nll"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Bigram-LM quality scoring — the conditional-probability upgrade
    * of [[text_unigram_logprob]] (one Markov order closer to the KenLM
    * models CCNet actually uses): per-doc avg −ln P(w₂|w₁) with
    * P(w₂|w₁) = c(w₁w₂)/c(w₁·) counted over the corpus. Same scale
    * shape as the unigram scorer: TRAIN is two vocab-sized two-phase
    * counts (bigrams + prefix unigrams); SCORE joins both tables onto
    * the bigram stream — unhinted, AQE broadcasts while they fit —
    * then one two-phase per-doc avg. Docs under 2 tokens have no
    * bigrams and drop out (both engines: empty comprehension).
    */
  q("text_bigram_logprob",
    """WITH tk AS (SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
      |     bg AS (SELECT doc_id,
      |              unnest([tok[i] || ' ' || tok[i+1] FOR i IN range(1, len(tok))]) AS b
      |            FROM tk),
      |     bc AS (SELECT b, count(*) AS cb FROM bg GROUP BY 1),
      |     uc AS (SELECT str_split(b, ' ')[1] AS w, count(*) AS cu FROM bg GROUP BY 1)
      |SELECT g.doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
      |       round(-avg(ln(CAST(bc.cb AS DOUBLE) / uc.cu)), 6) AS avg_nll
      |FROM bg g JOIN bc ON bc.b = g.b
      |JOIN uc ON uc.w = str_split(g.b, ' ')[1]
      |GROUP BY g.doc_id ORDER BY g.doc_id""") { (s, d) =>
    val bg = T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .filter(size(col("tok")) >= 2) // sequence(0, size-2) must not descend
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tok) - 2), i -> concat_ws(' ', slice(tok, i + 1, 2)))")).as("b"))
      .withColumn("w1", substring_index(col("b"), " ", 1))
    val bc = bg.groupBy("b").agg(count(lit(1)).as("cb"))
    val uc = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
    bg.join(bc, Seq("b"))
      .join(uc, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        round(-avg(log(col("cb").cast("double") / col("cu"))), 6).as("avg_nll"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995 /
    * Chen & Goodman 1998 §2.7 — THE n-gram smoothing standard; the
    * MLE row above assigns unseen-context mass badly, KN discounts
    * observed counts by d and backs off to the CONTINUATION
    * distribution "how many contexts does w appear in", the
    * famous San-Francisco correction): P(w2|w1) =
    * max(c(w1w2)−d, 0)/c(w1·) + d·N₁₊(w1·)/c(w1·) · N₁₊(·w2)/N₁₊(··)
    * with d = 0.75 (Chen–Goodman's canonical discount, an exact
    * binary fraction). All inputs are integer counts off ONE bigram
    * type frame (three vocab-sized two-phase aggs share it); the
    * probability is one fixed-shape ratio expression + one ln +
    * round (the bigram_logprob avg-NLL precedent); joins back to the
    * doc grain are vocab-keyed equi-joins; the type total is a 1-row
    * broadcast.
    */
  q("text_bigram_kn",
    """WITH tk AS (SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
      |     sp AS (SELECT doc_id,
      |              unnest([{'w1': tok[i], 'w2': tok[i+1]} FOR i IN range(1, len(tok))],
      |                     recursive := true)
      |            FROM tk),
      |     bc AS (SELECT w1, w2, count(*) AS cb FROM sp GROUP BY 1, 2),
      |     uc AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu, count(*) AS n1f
      |            FROM bc GROUP BY 1),
      |     cc AS (SELECT w2, count(*) AS n1b FROM bc GROUP BY 1),
      |     nbt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bc)
      |SELECT g.doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
      |       round(-avg(ln(
      |         greatest(bc.cb - 0.75, 0.0) / uc.cu
      |         + (0.75 * uc.n1f / uc.cu) * (cc.n1b / nbt.n))), 6) AS avg_nll_kn
      |FROM sp g JOIN bc ON bc.w1 = g.w1 AND bc.w2 = g.w2
      |JOIN uc ON uc.w1 = g.w1 JOIN cc ON cc.w2 = g.w2, nbt
      |GROUP BY g.doc_id ORDER BY g.doc_id""") { (s, d) =>
    val sp = T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .filter(size(col("tok")) >= 2) // sequence(0, size-2) must not descend
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tok) - 2), i -> struct(tok[i] as w1, tok[i+1] as w2))"))
        .as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bc = sp.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val uc = bc.groupBy("w1").agg(sum("cb").cast("long").as("cu"),
      count(lit(1)).as("n1f"))
    val cc = bc.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val nbt = bc.agg(count(lit(1)).cast("double").as("n"))
    sp.join(bc, Seq("w1", "w2")).join(uc, Seq("w1")).join(cc, Seq("w2"))
      .crossJoin(broadcast(nbt)) // 1-row type total: genuinely bounded
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        round(-avg(log(greatest(col("cb") - 0.75, lit(0.0)) / col("cu")
          + (lit(0.75) * col("n1f") / col("cu")) * (col("n1b") / col("n")))), 6)
          .as("avg_nll_kn"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** PMI-ranked bigram collocations (Church & Hanks 1990 — the
    * association measure behind phrase mining / multiword-expression
    * detection; the corpus-LEVEL companion to the per-doc
    * [[text_bigram_logprob]] LM score): PMI(a,b) = ln(p(a,b) /
    * (p(a)·p(b))) with p(a,b) from the bigram distribution and p(·)
    * from the unigram token distribution, reported for every bigram
    * with count ≥ 3 (the Church–Hanks low-count cutoff — PMI is
    * notoriously unstable on hapax pairs). All inputs are integer
    * counts; the PMI is ONE fixed-shape ratio-first double expression
    * (each factor is a bounded ratio, so no 2⁵³ product risk at any
    * corpus size) + a single log + round (rule 5, the bigram_logprob
    * ln precedent). Shape: one token explode feeding BOTH count
    * frames via two-phase aggs (shuffles are vocab-sized, never
    * token-level), two vocab-sized equi-joins onto the surviving
    * bigrams, totals as 1-row broadcast crosses; output ordered by
    * the ROUNDED pmi so the report order is engine-identical.
    */
  q("text_collocation_pmi",
    """WITH tk AS (SELECT str_split(text, ' ') AS tok FROM documents),
      |     un AS (SELECT unnest(tok) AS w FROM tk),
      |     uni AS (SELECT w, count(*) AS cu FROM un GROUP BY 1),
      |     tu AS (SELECT count(*) AS n_uni FROM un),
      |     bg AS (SELECT tok[i] AS w1, tok[i+1] AS w2
      |            FROM tk, unnest(generate_series(1, len(tok) - 1)) AS u(i)),
      |     tb AS (SELECT count(*) AS n_bi FROM bg),
      |     bc AS (SELECT w1, w2, count(*) AS cab FROM bg
      |            GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT bc.w1 AS w1, bc.w2 AS w2, CAST(bc.cab AS BIGINT) AS cab,
      |       CAST(a.cu AS BIGINT) AS ca, CAST(b.cu AS BIGINT) AS cb,
      |       round(ln((CAST(bc.cab AS DOUBLE) / a.cu)
      |                * (CAST(n_uni AS DOUBLE) / b.cu)
      |                * (CAST(n_uni AS DOUBLE) / n_bi)), 6) AS pmi
      |FROM bc JOIN uni a ON a.w = bc.w1 JOIN uni b ON b.w = bc.w2, tu, tb
      |ORDER BY pmi DESC, w1, w2""") { (s, d) =>
    val tk = T(s, d, "documents").select(split(col("text"), " ").as("tok"))
    val un = tk.select(explode(col("tok")).as("w"))
    val uni = un.groupBy("w").agg(count(lit(1)).as("cu"))
    val totU = un.agg(count(lit(1)).as("n_uni"))
    // the ngram_freq zip_with device: two shifted slices, no per-index lambda
    val n1 = greatest(size(col("tok")) - 1, lit(0))
    val bg = tk.select(explode(zip_with(
        slice(col("tok"), lit(1), n1), slice(col("tok"), lit(2), n1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val totB = bg.agg(count(lit(1)).as("n_bi"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 3)
    bc.join(uni.select(col("w").as("w1"), col("cu").as("ca")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("cb")), Seq("w2"))
      .crossJoin(broadcast(totU)) // 1-row totals: genuinely bounded
      .crossJoin(broadcast(totB))
      .select(col("w1"), col("w2"), col("cab"), col("ca"), col("cb"),
        round(log((col("cab").cast("double") / col("ca"))
          * (col("n_uni").cast("double") / col("cb"))
          * (col("n_uni").cast("double") / col("n_bi"))), 6).as("pmi"))
      .reportSorted(col("pmi").desc, col("w1"), col("w2"))
  }

  /** Word burstiness — variance-to-mean ratio of per-doc counts for
    * the top-20 corpus words (Church & Gale 1995's deviation-from-
    * Poisson: VMR ≈ 1 means a word scatters like noise (function
    * words), VMR ≫ 1 means it CLUMPS into the few docs that are
    * "about" it (content words) — the signal behind TF-IDF's df
    * intuition and a topicality feature for quality scoring). Docs
    * NOT containing the word enter as zeros via the identity
    * Σ(x−x̄)² over all n docs = nΣx² − (Σx)² with sums taken over
    * occurrences only — so no dense word×doc frame is ever built.
    * Σx and Σx² are exact BIGINTs; VMR = (nΣx²−(Σx)²)/((n−1)Σx) is
    * ONE fixed-shape expression over cast integers (rule 5). Shape:
    * one token explode → two-phase (w, doc) count → vocab-sized agg;
    * the top-20 rank runs on the VOCAB frame (bounded), the doc
    * count is a 1-row broadcast.
    */
  q("text_burstiness",
    """WITH tk AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents),
      |     nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |     pc AS (SELECT w, doc_id, count(*) AS c FROM tk GROUP BY 1, 2),
      |     agg AS (SELECT w, CAST(sum(c) AS BIGINT) AS sx,
      |                    CAST(sum(c*c) AS BIGINT) AS sx2,
      |                    count(*) AS ndocs FROM pc GROUP BY 1),
      |     top AS (SELECT *, row_number() OVER (ORDER BY sx DESC, w) AS rn FROM agg)
      |SELECT w, sx AS corpus_count, CAST(ndocs AS BIGINT) AS n_docs,
      |       round((CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx)
      |             / ((n - 1) * sx), 6) AS vmr
      |FROM top, nd WHERE rn <= 20 ORDER BY corpus_count DESC, w""") { (s, d) =>
    val tk = T(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val nd = T(s, d, "documents").agg(count(lit(1)).cast("long").as("n"))
    val agg = tk.groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("w")
      .agg(sum("c").cast("long").as("sx"),
        sum(col("c") * col("c")).cast("long").as("sx2"),
        count(lit(1)).as("ndocs"))
    // top-20 as orderBy+limit → TakeOrderedAndProject (distributed
    // per-partition top-k + driver merge), NOT row_number over an
    // unpartitioned window, which plans a single-partition sort of the
    // ENTIRE vocabulary (r18 verdict item 6). (sx, w) is a total order
    // (w is the group key), so the kept 20 rows are identical.
    agg.orderBy(col("sx").desc, col("w").asc).limit(20)
      .crossJoin(broadcast(nd)) // 1-row doc count: genuinely bounded
      .select(col("w"), col("sx").as("corpus_count"), col("ndocs").as("n_docs"),
        round((col("n").cast("double") * col("sx2")
            - col("sx").cast("double") * col("sx"))
          / ((col("n") - 1) * col("sx")), 6).as("vmr"))
      .reportSorted(col("corpus_count").desc, col("w"))
  }

  /** Feature hashing / the hashing trick (Weinberger et al. 2009):
    * per-doc sparse term-count vector in a FIXED 1024-slot space —
    * slot = polyhash(token) mod 1024 — the vocabulary-free
    * featurization that needs NO fitted dictionary, no vocab
    * broadcast, no OOV path: the properties that make it the
    * featurizer that still works when the vocab is 10⁹ strings.
    * Collisions are the accepted tradeoff BY DESIGN (Weinberger's
    * inner-product-preservation argument), not a bug. Hash = the
    * native codegen'd token polynomial ([[graft.functions.text.
    * tokenPolyHash]], the contentBucket device — codepoint fold both
    * engines replay exactly). Shape: one scan → explode → ONE
    * two-phase (doc_id, slot) count — map-side combine bounds the
    * shuffle by distinct (doc, slot) pairs ≤ 1024/doc regardless of
    * doc length.
    */
  q("text_hashed_features",
    """WITH h AS (SELECT doc_id,
      |    unnest(list_transform(str_split(text, ' '), t ->
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(str_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
      |        (a, b) -> (a * 31 + b) % 1000000007))) AS hv
      |  FROM documents)
      |SELECT doc_id, CAST(hv % 1024 AS INTEGER) AS slot, count(*) AS n
      |FROM h GROUP BY 1, 2 ORDER BY doc_id, slot""") { (s, d) =>
    T(s, d, "documents")
      .select(col("doc_id"),
        explode(graft.functions.text.tokenPolyHash(split(col("text"), " "))).as("hv"))
      .select(col("doc_id"), pmod(col("hv"), lit(1024L)).cast("int").as("slot"))
      .groupBy("doc_id", "slot").agg(count(lit(1)).as("n"))
      .reportSorted("doc_id", "slot") // ≤1024 slots per doc = bounded
  }

  /** PII redaction (SPEC: standard corpus-curation scrub — C4/RefinedWeb
    * drop or mask emails and phone numbers before training): mask every
    * email/phone match and count what was masked. The synthetic corpus
    * carries no PII, so the query first injects a deterministic contact
    * string derived from doc_id — the redaction then provably fires on
    * every row and the oracle reproduces it exactly. Pure per-row regex
    * work: zero shuffle, stays inside whole-stage codegen, one pass at
    * any scale. Patterns avoid Java/RE2 divergence (no backrefs, no
    * lookaround).
    */
  /** Out-of-fold mean-target encoding (SPEC: the Micci-Barreca 2001
    * smoothed target statistic with K-fold leakage protection — the
    * categorical-feature encoder every tabular/ranker stack uses;
    * CatBoost's ordered TE is the streaming refinement of the same
    * idea. Encoding a category by its own row's label LEAKS the
    * target — each row must see the statistic computed WITHOUT its
    * fold). Folds are the LCG hash of doc_id mod 5 (deterministic and
    * re-ingestion-stable like doc_id % 5, but DECORRELATED from any
    * id-assignment structure — this corpus assigns ids round-robin
    * over sources, so raw id % 5 is CONSTANT per source and the
    * out-of-fold statistic degenerates to the prior everywhere);
    * te = (pos_oof + α·prior)/(n_oof + α), α=10, prior = global base
    * rate — counts are exact integers, prior an exact rational, so
    * the ratio is one deterministic double rounded once. Shape: one
    * (category, fold) two-phase agg (≤ |categories|·K rows) broadcast
    * back onto the corpus — map-shaped at any scale, no per-row
    * window, no self-join.
    */
  q("pipeline_target_encode",
    """WITH f AS (SELECT doc_id, source,
      |                  ((doc_id % 2147483648) * 1103515245 + 12345)
      |                    % 2147483648 % 5 AS fold,
      |                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |           FROM documents),
      |sf AS (SELECT source, fold, CAST(count(*) AS BIGINT) AS n_sf,
      |              CAST(sum(y) AS BIGINT) AS p_sf
      |       FROM f GROUP BY source, fold),
      |st AS (SELECT source, CAST(sum(n_sf) AS BIGINT) AS n_s,
      |              CAST(sum(p_sf) AS BIGINT) AS p_s
      |       FROM sf GROUP BY source),
      |g AS (SELECT CAST(sum(n_s) AS BIGINT) AS n, CAST(sum(p_s) AS BIGINT) AS p
      |      FROM st)
      |SELECT f.doc_id, f.source, CAST(f.fold AS INTEGER) AS fold, f.y,
      |       round((st.p_s - sf.p_sf + 10.0 * (g.p * 1.0 / g.n))
      |             / (st.n_s - sf.n_sf + 10.0), 6) AS te
      |FROM f JOIN sf ON sf.source = f.source AND sf.fold = f.fold
      |       JOIN st ON st.source = f.source
      |       CROSS JOIN g
      |ORDER BY f.doc_id""") { (s, d) =>
    val f = T(s, d, "documents")
      .select(col("doc_id"), col("source"),
        pmod(pmod(col("doc_id"), lit(2147483648L)) * lit(1103515245L)
          + lit(12345L), lit(2147483648L)).%(5).as("fold"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .localCheckpoint() // scored once; three stat consumers below
    val sf = f.groupBy("source", "fold")
      .agg(count(lit(1)).cast("long").as("n_sf"), sum("y").cast("long").as("p_sf"))
      .localCheckpoint()
    val st = sf.groupBy("source")
      .agg(sum("n_sf").cast("long").as("n_s"), sum("p_sf").cast("long").as("p_s"))
    val g = st.agg(sum("n_s").cast("long").as("n"), sum("p_s").cast("long").as("p"))
    f.join(broadcast(sf), Seq("source", "fold"))
      .join(broadcast(st), Seq("source"))
      .crossJoin(broadcast(g))
      .select(col("doc_id"), col("source"), col("fold").cast("int").as("fold"),
        col("y"),
        round((col("p_s") - col("p_sf") + lit(10.0) *
          (col("p") * lit(1.0) / col("n"))) /
          (col("n_s") - col("n_sf") + lit(10.0)), 6).as("te"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Hard-negative mining for contrastive training (SPEC: the DPR /
    * SimCSE data-prep step — Karpukhin et al. 2020 §3.2: for each
    * anchor, the most-similar candidate with a DIFFERENT label is the
    * "hard negative" that actually teaches the margin, vs trivially
    * easy random negatives). Shape: the registered LSH bucketing
    * restricts candidates to same-bucket pairs (the 100 TB pruning —
    * mining never scans cross-bucket), the label-mismatch filter rides
    * the same join, exact cosine ranks the survivors, top-1 per
    * anchor. Same machinery as dedup_embedding_cosine with the
    * polarity flipped: dedup keeps the most-similar SAME thing,
    * mining keeps the most-similar DIFFERENT-labeled thing.
    */
  q("pipeline_hard_negatives",
    s"""WITH bk AS (SELECT vec_id, embedding, label, ${bucketSql(6)} AS bucket
       |            FROM embeddings),
       |cand AS (
       |  SELECT l.vec_id AS qid, l.label AS q_label,
       |         r.vec_id AS nid, r.label AS neg_label,
       |         round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
       |                                      CAST(r.embedding AS DOUBLE[])), 6) AS cos
       |  FROM bk l JOIN bk r ON l.bucket = r.bucket
       |    AND l.vec_id <> r.vec_id AND l.label <> r.label)
       |SELECT qid, hard_neg, cos, q_label, neg_label FROM (
       |  SELECT qid, nid AS hard_neg, cos, q_label, neg_label,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
       |  FROM cand) t
       |WHERE rn = 1 ORDER BY qid""".stripMargin) { (s, d) =>
    val b = lshBucketed(s, d, 6)
    val l = b.select(col("bucket"), col("vec_id").as("qid"),
      col("embedding").as("ua"), col("label").as("q_label"))
    val r = b.select(col("bucket"), col("vec_id").as("nid"),
      col("embedding").as("ub"), col("label").as("neg_label"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    l.join(r, Seq("bucket"))
      .filter(col("qid") =!= col("nid") && col("q_label") =!= col("neg_label"))
      .withColumn("cos", round(graft.functions.vec.cosine(col("ua"), col("ub")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("nid").as("hard_neg"), col("cos"),
        col("q_label"), col("neg_label"))
      .orderBy("qid") // one row per anchor = input-sized
  }

  /** BLEU-2 between document pairs (SPEC: Papineni et al. 2002 — the
    * clipped-n-gram-precision MT metric, here in its data-pipeline
    * role: scoring how much of a candidate document is lifted from a
    * reference, the graded companion of the binary dedup verdicts).
    * Pairing is the deterministic adjacent-id join (a=2k, b=2k+1) — a
    * pure equi-join demo fixture; production swaps in the minhash
    * candidate pairs and nothing downstream changes. Per pair:
    * clipped precisions p_n = Σ_g min(c_cand(g), c_ref(g)) / Σ_g
    * c_cand(g) for n=1,2 — ALL INTEGER until the final ratios — the
    * brevity penalty min(1, e^(1−r/c)) (its one libm exp washes under
    * round-6, rule 5), and BLEU-2 = BP·√(p₁p₂). No smoothing: a
    * zero-match pair scores an honest 0. Shape: one pairing equi-join
    * + gram-keyed two-phase counts + (pair, gram)-keyed joins + a
    * per-pair aggregate — every shuffle is key-partitioned,
    * pair-bounded output.
    */
  q("text_bleu_pairs",
    """WITH p AS (
      |  SELECT d1.doc_id AS a, d2.doc_id AS b, d1.text AS ta, d2.text AS tb
      |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      |  WHERE d1.doc_id % 2 = 0),
      |u1a AS (SELECT a, g, count(*) AS c FROM
      |          (SELECT a, unnest(str_split(ta, ' ')) AS g FROM p) GROUP BY a, g),
      |u1b AS (SELECT a, g, count(*) AS c FROM
      |          (SELECT a, unnest(str_split(tb, ' ')) AS g FROM p) GROUP BY a, g),
      |u2a AS (SELECT a, g, count(*) AS c FROM
      |          (SELECT a, unnest([tok[i] || ' ' || tok[i+1]
      |                             FOR i IN range(1, len(tok))]) AS g
      |           FROM (SELECT a, str_split(ta, ' ') AS tok FROM p)) GROUP BY a, g),
      |u2b AS (SELECT a, g, count(*) AS c FROM
      |          (SELECT a, unnest([tok[i] || ' ' || tok[i+1]
      |                             FOR i IN range(1, len(tok))]) AS g
      |           FROM (SELECT a, str_split(tb, ' ') AS tok FROM p)) GROUP BY a, g),
      |m1 AS (SELECT u1a.a, CAST(sum(least(u1a.c, u1b.c)) AS BIGINT) AS m
      |       FROM u1a JOIN u1b ON u1a.a = u1b.a AND u1a.g = u1b.g GROUP BY u1a.a),
      |m2 AS (SELECT u2a.a, CAST(sum(least(u2a.c, u2b.c)) AS BIGINT) AS m
      |       FROM u2a JOIN u2b ON u2a.a = u2b.a AND u2a.g = u2b.g GROUP BY u2a.a),
      |tot AS (SELECT a, b,
      |               CAST(len(str_split(ta, ' ')) AS BIGINT) AS c_len,
      |               CAST(len(str_split(tb, ' ')) AS BIGINT) AS r_len
      |        FROM p),
      |sc AS (SELECT t.a, t.b, t.c_len, t.r_len,
      |              coalesce(m1.m, 0) AS n1, coalesce(m2.m, 0) AS n2,
      |              coalesce(m1.m, 0) * 1.0 / t.c_len AS p1,
      |              coalesce(m2.m, 0) * 1.0 / nullif(t.c_len - 1, 0) AS p2,
      |              CASE WHEN t.c_len >= t.r_len THEN 1.0
      |                   ELSE exp(1.0 - t.r_len * 1.0 / t.c_len) END AS bp
      |       FROM tot t LEFT JOIN m1 ON m1.a = t.a LEFT JOIN m2 ON m2.a = t.a)
      |SELECT a, b, c_len AS len_a, r_len AS len_b, n1, n2,
      |       round(p1, 6) AS p1, round(p2, 6) AS p2,
      |       round(bp * sqrt(p1 * p2), 6) AS bleu2
      |FROM sc ORDER BY a""") { (s, d) =>
    val docs = T(s, d, "documents")
    val p = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("a"), col("text").as("ta"),
        (col("doc_id") + 1).as("bk"))
      .join(docs.select(col("doc_id").as("bk2"), col("text").as("tb")),
        col("bk") === col("bk2"))
      .select(col("a"), col("bk").as("b"), col("ta"), col("tb"))
      .localCheckpoint()
    def uni(c: String): org.apache.spark.sql.Column = split(col(c), " ")
    def bi(c: String): org.apache.spark.sql.Column = expr(
      s"transform(slice(split($c, ' '), 1, greatest(size(split($c, ' ')) - 1, 0)), " +
        s"(t, i) -> concat(t, ' ', element_at(split($c, ' '), i + 2)))")
    def grams(src: org.apache.spark.sql.Column, tag: String): DataFrame = p
      .select(col("a"), explode(src).as("g"))
      .groupBy("a", "g").agg(count(lit(1)).as(s"c$tag"))
    def matches(ga: DataFrame, gb: DataFrame): DataFrame = ga
      .join(gb, Seq("a", "g"))
      .groupBy("a").agg(sum(least(col("ca"), col("cb"))).cast("long").as("m"))
    val mm1 = matches(grams(uni("ta"), "a"), grams(uni("tb"), "b"))
      .withColumnRenamed("m", "n1")
    val mm2 = matches(grams(bi("ta"), "a"), grams(bi("tb"), "b"))
      .withColumnRenamed("m", "n2")
    val tot = p.select(col("a"), col("b"),
      size(split(col("ta"), " ")).cast("long").as("c_len"),
      size(split(col("tb"), " ")).cast("long").as("r_len"))
    val sc = tot.join(mm1, Seq("a"), "left").join(mm2, Seq("a"), "left")
      .select(col("a"), col("b"), col("c_len"), col("r_len"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"))
    val p1 = col("n1") * lit(1.0) / col("c_len")
    val p2 = col("n2") * lit(1.0) / nullif(col("c_len") - 1, lit(0L))
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("r_len") * lit(1.0) / col("c_len")))
    sc.select(col("a"), col("b"), col("c_len").as("len_a"), col("r_len").as("len_b"),
        col("n1"), col("n2"), round(p1, 6).as("p1"), round(p2, 6).as("p2"),
        round(bp * sqrt(p1 * p2), 6).as("bleu2"))
      .orderBy("a") // one row per pair = input-sized
  }

  /** chrF between adjacent doc pairs (r16, SPEC: Popović 2015 "chrF:
    * character n-gram F-score for automatic MT evaluation" — the
    * third leg of the generation-eval trio beside [[text_bleu_pairs]]
    * (precision) and ROUGE (recall): chrF's CHARACTER n-grams are
    * robust to tokenization/morphology, which is why WMT adopted it as
    * the default lexical metric): whitespace-removed char n-grams for
    * n ∈ {1,2,3} on the SAME adjacent-id pair scheme and
    * clipped-count machinery; per n, P = matches/|cand grams|, R =
    * matches/|ref grams|, F_n = 5PR/(4P+R) (β = 2 per the paper,
    * recall weighted double), zero when either side has no grams;
    * chrf3 = mean of the three UNROUNDED F_n. All counts integer;
    * every ratio is the same ops-ordered expression on both engines.
    * Same shuffle shape as BLEU: per-pair gram explode → two-phase
    * counts → (pair, gram) equi-join → per-pair aggregate.
    */
  /** Fused tagged char-gram explode over `t` for chrF's n ∈ {1,2,3}.
    * The `length(t) >= n` guard is load-bearing: Spark's
    * `sequence(1, 0)` DESCENDS ([1, 0]), which would fabricate two
    * phantom grams (substring at pos 1 and pos 0) on any text shorter
    * than n — both sides would then "match", yielding F_n = 1.0 where
    * the oracle's `range(1, len-n+2)` (empty) yields 0.0. Same hazard
    * class as the BLEU explode's must-not-descend filter.
    */
  private[graft] val ChrfGramExplodeSql: String =
    "flatten(transform(array(1, 2, 3), n -> " +
      "if(length(t) >= n, " +
      "transform(sequence(1, length(t) - n + 1), " +
      "i -> struct(n AS n, substring(t, i, n) AS g)), " +
      "array())))"

  q("text_chrf_pairs", {
    def gramsCte(side: Char, n: Int): String =
      s"""u$n$side AS (SELECT a, g, count(*) AS c FROM
         |  (SELECT a, unnest([substr(t, i, $n) FOR i IN range(1, len(t) - $n + 2)]) AS g
         |   FROM (SELECT a, replace(t$side, ' ', '') AS t FROM p)) GROUP BY a, g)""".stripMargin
    def matchCte(n: Int): String =
      s"""m$n AS (SELECT u${n}a.a, CAST(sum(least(u${n}a.c, u${n}b.c)) AS BIGINT) AS m
         |        FROM u${n}a JOIN u${n}b ON u${n}a.a = u${n}b.a AND u${n}a.g = u${n}b.g
         |        GROUP BY u${n}a.a)""".stripMargin
    def totCte(side: Char, n: Int): String =
      s"""t$n$side AS (SELECT a, CAST(sum(c) AS BIGINT) AS tot FROM u$n$side GROUP BY a)""".stripMargin
    def fExpr(n: Int): String =
      s"""CASE WHEN coalesce(m$n.m, 0) = 0 THEN 0.0
         |     ELSE 5.0 * (m$n.m * 1.0 / t${n}a.tot) * (m$n.m * 1.0 / t${n}b.tot)
         |          / (4.0 * (m$n.m * 1.0 / t${n}a.tot) + (m$n.m * 1.0 / t${n}b.tot)) END""".stripMargin
    val ctes = (1 to 3).flatMap(n =>
      Seq(gramsCte('a', n), gramsCte('b', n), matchCte(n),
        totCte('a', n), totCte('b', n))).mkString(",\n")
    val joins = (1 to 3).map(n =>
      s"LEFT JOIN m$n ON m$n.a = p.a LEFT JOIN t${n}a ON t${n}a.a = p.a " +
        s"LEFT JOIN t${n}b ON t${n}b.a = p.a").mkString("\n")
    s"""WITH p AS (
       |  SELECT d1.doc_id AS a, d2.doc_id AS b, d1.text AS ta, d2.text AS tb
       |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
       |  WHERE d1.doc_id % 2 = 0),
       |$ctes
       |SELECT p.a, p.b,
       |       round(${fExpr(1)}, 6) AS f1,
       |       round(${fExpr(2)}, 6) AS f2,
       |       round(${fExpr(3)}, 6) AS f3,
       |       round((${fExpr(1)} + ${fExpr(2)} + ${fExpr(3)}) / 3.0, 6) AS chrf3
       |FROM p
       |$joins
       |ORDER BY p.a""".stripMargin
  }) { (s, d) =>
    val docs = T(s, d, "documents")
    val p = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("a"), col("text").as("ta"),
        (col("doc_id") + 1).as("bk"))
      .join(docs.select(col("doc_id").as("bk2"), col("text").as("tb")),
        col("bk") === col("bk2"))
      .select(col("a"), col("bk").as("b"), col("ta"), col("tb"))
      .localCheckpoint()
    // ONE tagged explode per side for all three gram sizes (a per-n
    // explode tripled the scan+shuffle volume — char grams are already
    // ~18× BLEU's token volume, so the fusion matters): (a, n, g) →
    // per-side counts → one clipped-match join keyed (a, n, g) → the
    // three F_n land as conditional aggregates of ONE (a, n) frame.
    def counts(srcCol: String, tag: String): DataFrame = p
      .select(col("a"), expr(s"replace($srcCol, ' ', '')").as("t"))
      .select(col("a"), explode(expr(ChrfGramExplodeSql)).as("ng"))
      .select(col("a"), col("ng.n").as("n"), col("ng.g").as("g"))
      .groupBy("a", "n", "g").agg(count(lit(1)).as(s"c$tag"))
    // no checkpoint: both reads of each side are the SAME expression
    // plan, so exchange reuse dedupes the explode+count work
    val ga = counts("ta", "a")
    val gb = counts("tb", "b")
    val m = ga.join(gb, Seq("a", "n", "g"))
      .groupBy("a", "n")
      .agg(sum(least(col("ca"), col("cb"))).cast("long").as("m"))
    val tots = ga.groupBy("a", "n").agg(sum("ca").cast("long").as("tota"))
      .join(gb.groupBy("a", "n").agg(sum("cb").cast("long").as("totb")),
        Seq("a", "n"), "outer")
      .join(m, Seq("a", "n"), "left")
    val aggs = (1 to 3).flatMap(n => Seq(
      max(when(col("n") === n, coalesce(col("m"), lit(0L)))).as(s"m$n"),
      max(when(col("n") === n, col("tota"))).as(s"tot${n}a"),
      max(when(col("n") === n, col("totb"))).as(s"tot${n}b")))
    val wide = tots.groupBy("a").agg(aggs.head, aggs.tail: _*)
    def fCol(n: Int): org.apache.spark.sql.Column = {
      val m = coalesce(col(s"m$n"), lit(0L))
      val pr = m * lit(1.0) / col(s"tot${n}a")
      val rc = m * lit(1.0) / col(s"tot${n}b")
      when(m === 0, lit(0.0))
        .otherwise(lit(5.0) * pr * rc / (lit(4.0) * pr + rc))
    }
    p.select("a", "b").join(wide, Seq("a"), "left")
      .select(col("a"), col("b"),
        round(fCol(1), 6).as("f1"), round(fCol(2), 6).as("f2"),
        round(fCol(3), 6).as("f3"),
        round((fCol(1) + fCol(2) + fCol(3)) / lit(3.0), 6).as("chrf3"))
      .orderBy("a") // one row per pair = input-sized
  }

  /** Levenshtein edit distance between adjacent doc pairs (r16 — the
    * fuzzy-match primitive every record-linkage/curation stack keeps
    * beside the n-gram metrics; SPEC: Levenshtein 1966, the standard
    * unit-cost DP): raw distance plus the length-normalized similarity
    * 1 − d/max(|a|,|b|) (the usual [0,1] calibration). BOTH engines
    * run their NATIVE implementation (Spark `levenshtein`, DuckDB
    * `levenshtein`) — the hash is a genuine cross-implementation check
    * of the DP, not a replay. Distances are exact integers; the one
    * ratio is the same ops-ordered division. Texts are capped at 500
    * chars (the DP is O(|a|·|b|) per pair — at 100 TB you run it on
    * CANDIDATE pairs after banding, never raw corpus pairs, and cap
    * operands; the cap is part of the contract, both engines apply
    * it).
    */
  q("text_levenshtein_pairs",
    """WITH p AS (
      |  SELECT d1.doc_id AS a, d2.doc_id AS b,
      |         substr(d1.text, 1, 500) AS ta, substr(d2.text, 1, 500) AS tb
      |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      |  WHERE d1.doc_id % 2 = 0)
      |SELECT a, b, CAST(levenshtein(ta, tb) AS INTEGER) AS dist,
      |       round(1.0 - levenshtein(ta, tb) * 1.0 /
      |             greatest(len(ta), len(tb)), 6) AS sim
      |FROM p ORDER BY a""".stripMargin) { (s, d) =>
    val docs = T(s, d, "documents")
    val p = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("a"), substring(col("text"), 1, 500).as("ta"),
        (col("doc_id") + 1).as("bk"))
      .join(docs.select(col("doc_id").as("bk2"),
        substring(col("text"), 1, 500).as("tb")), col("bk") === col("bk2"))
    p.select(col("a"), col("bk").as("b"),
        levenshtein(col("ta"), col("tb")).cast("int").as("dist"),
        round(lit(1.0) - levenshtein(col("ta"), col("tb")) * lit(1.0) /
          greatest(length(col("ta")), length(col("tb"))), 6).as("sim"))
      .orderBy("a") // one row per pair = input-sized
  }

  /** recall@k retrieval eval (r16 — [[eval_mrr]]'s set-coverage
    * companion on the SAME shared top-10 kNN build): per query,
    * hits = |top-10 ∩ same-label|, n_relevant = same-label corpus
    * vectors minus self (exact, from one label-count aggregate), and
    * recall = hits / n_relevant — the plain IR definition over the
    * TRUE relevant-set size, not a k-cap (so a label with 40 members
    * can't score 1.0 by retrieving 10). Per-query rows; integer
    * numerators/denominators, one ratio.
    */
  q("eval_recall_at_k", {
    val (bucketCols, unions) = multiLshCandCtes(6, 6)
    s"""WITH bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     cand AS (
       |  $unions),
       |     scored AS (
       |  SELECT c.a, c.b,
       |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.a
       |  JOIN embeddings eb ON eb.vec_id = c.b),
       |     edges AS (SELECT a AS qid, b AS nbr, cos FROM scored
       |               UNION ALL SELECT b, a, cos FROM scored),
       |     rk AS (SELECT qid, nbr, CAST(row_number() OVER (
       |              PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rank
       |            FROM edges),
       |     lc AS (SELECT label, CAST(count(*) AS INTEGER) AS n
       |            FROM embeddings GROUP BY label),
       |     hits AS (SELECT r.qid, CAST(count(*) AS INTEGER) AS h
       |              FROM rk r
       |              JOIN embeddings q ON q.vec_id = r.qid
       |              JOIN embeddings nb ON nb.vec_id = r.nbr
       |              WHERE r.rank <= 10 AND q.label = nb.label
       |              GROUP BY r.qid)
       |SELECT e.vec_id AS qid, coalesce(h.h, 0) AS hits,
       |       lc.n - 1 AS n_relevant,
       |       round(coalesce(h.h, 0) * 1.0 / nullif(lc.n - 1, 0), 6) AS recall
       |FROM embeddings e
       |JOIN lc ON lc.label = e.label
       |LEFT JOIN hits h ON h.qid = e.vec_id
       |ORDER BY qid""".stripMargin
  }) { (s, d) =>
    val emb = T(s, d, "embeddings")
    val ranked = knnEdges(emb.select("vec_id", "embedding"), k = 10)
    val labels = emb.select("vec_id", "label")
    val lc = emb.groupBy("label").agg(count(lit(1)).cast("int").as("n"))
    val hits = ranked
      .join(labels.select(col("vec_id").as("qid"), col("label").as("ql")), Seq("qid"))
      .join(labels.select(col("vec_id").as("nbr"), col("label").as("nl")), Seq("nbr"))
      .filter(col("ql") === col("nl"))
      .groupBy("qid").agg(count(lit(1)).cast("int").as("h"))
    labels.select(col("vec_id").as("qid"), col("label"))
      .join(broadcast(lc), Seq("label"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("h"), lit(0)).as("hits"),
        (col("n") - 1).as("n_relevant"),
        round(coalesce(col("h"), lit(0)) * lit(1.0) /
          nullif(col("n") - 1, lit(0)), 6).as("recall"))
      .orderBy("qid") // one row per vector = input-sized
  }

  /** nDCG@10 retrieval eval (r17 — completes the retrieval-eval trio
    * on the SAME shared top-10 kNN build: rank-based [[eval_mrr]],
    * set-based [[eval_recall_at_k]], and this GRADED-position metric;
    * SPEC: Järvelin & Kekäläinen 2002 "Cumulated gain-based evaluation
    * of IR techniques", TOIS): per query, DCG@10 = Σ rel_i/log2(i+1)
    * over the top-10 ranks (binary relevance rel = 1 on label match —
    * the corpus carries no graded judgments, and fabricating grades
    * would fake the metric), IDCG@10 = the ideal prefix
    * Σ_{i=1..min(10, n_relevant)} 1/log2(i+1) with n_relevant the TRUE
    * same-label corpus count minus self (the [[eval_recall_at_k]]
    * denominator discipline — a query whose label has 3 members can't
    * be penalized for not filling 10 slots), and nDCG = DCG/IDCG
    * (0 for singleton labels). Both engines sum ≤ 10 log2 terms and
    * round at 6 dp; the IDCG prefix is generated in ascending-i order
    * on both sides. One row per vector = input-sized output.
    */
  q("eval_ndcg_at_k", {
    val (bucketCols, unions) = multiLshCandCtes(6, 6)
    s"""WITH bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     cand AS (
       |  $unions),
       |     scored AS (
       |  SELECT c.a, c.b,
       |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.a
       |  JOIN embeddings eb ON eb.vec_id = c.b),
       |     edges AS (SELECT a AS qid, b AS nbr, cos FROM scored
       |               UNION ALL SELECT b, a, cos FROM scored),
       |     rk AS (SELECT qid, nbr, CAST(row_number() OVER (
       |              PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rank
       |            FROM edges),
       |     lc AS (SELECT label, CAST(count(*) AS INTEGER) AS n
       |            FROM embeddings GROUP BY label),
       |     dcg AS (SELECT r.qid, sum(1.0 / log2(r.rank + 1)) AS dcg
       |             FROM rk r
       |             JOIN embeddings q ON q.vec_id = r.qid
       |             JOIN embeddings nb ON nb.vec_id = r.nbr
       |             WHERE r.rank <= 10 AND q.label = nb.label
       |             GROUP BY r.qid)
       |SELECT e.vec_id AS qid,
       |       lc.n - 1 AS n_relevant,
       |       round(coalesce(dcg.dcg, 0.0), 6) AS dcg,
       |       CASE WHEN lc.n - 1 = 0 THEN NULL
       |            ELSE round(list_sum([1.0 / log2(i + 1)
       |                 FOR i IN range(1, least(10, lc.n - 1) + 1)]), 6)
       |       END AS idcg,
       |       CASE WHEN lc.n - 1 = 0 THEN 0.0
       |            ELSE round(coalesce(dcg.dcg, 0.0) /
       |                 list_sum([1.0 / log2(i + 1)
       |                           FOR i IN range(1, least(10, lc.n - 1) + 1)]), 6)
       |       END AS ndcg
       |FROM embeddings e
       |JOIN lc ON lc.label = e.label
       |LEFT JOIN dcg ON dcg.qid = e.vec_id
       |ORDER BY qid""".stripMargin
  }) { (s, d) =>
    val emb = T(s, d, "embeddings")
    val ranked = knnEdges(emb.select("vec_id", "embedding"), k = 10)
    val labels = emb.select("vec_id", "label")
    val lc = emb.groupBy("label").agg(count(lit(1)).cast("int").as("n"))
    val dcg = ranked
      .join(labels.select(col("vec_id").as("qid"), col("label").as("ql")), Seq("qid"))
      .join(labels.select(col("vec_id").as("nbr"), col("label").as("nl")), Seq("nbr"))
      .filter(col("ql") === col("nl"))
      .groupBy("qid")
      .agg(sum(lit(1.0) / log2(col("rank") + 1)).as("dcg"))
    // sequence(1, 0) would DESCEND for singleton labels (the chrF
    // hazard class) — every use sits behind the n_relevant > 0 guard
    val idcgExpr = expr(
      "aggregate(sequence(1, least(10, n_relevant)), cast(0.0 as double), " +
        "(acc, i) -> acc + 1.0 / log2(i + 1))")
    labels.select(col("vec_id").as("qid"), col("label"))
      .join(broadcast(lc), Seq("label"))
      .join(dcg, Seq("qid"), "left")
      .withColumn("n_relevant", col("n") - 1)
      .select(col("qid"), col("n_relevant"),
        round(coalesce(col("dcg"), lit(0.0)), 6).as("dcg"),
        when(col("n_relevant") === 0, lit(null).cast("double"))
          .otherwise(round(idcgExpr, 6)).as("idcg"),
        when(col("n_relevant") === 0, lit(0.0))
          .otherwise(round(coalesce(col("dcg"), lit(0.0)) / idcgExpr, 6))
          .as("ndcg"))
      .orderBy("qid") // one row per vector = input-sized
  }

  /** MAP@10 retrieval eval (r17 — completes the retrieval-eval
    * quartet on the SAME shared top-10 kNN build: rank-based
    * [[eval_mrr]], set-based [[eval_recall_at_k]], graded-position
    * [[eval_ndcg_at_k]], and this precision-averaging metric; SPEC:
    * the TREC average-precision definition, e.g. Buckley & Voorhees
    * 2000): per query, AP@10 = Σ_{k ≤ 10, k relevant} P@k divided by
    * min(n_relevant, 10) — the standard cutoff normalizer (a query
    * whose label has 3 members is judged against 3 attainable hits,
    * and one with 40 against the 10 the cutoff allows). P@k =
    * hits-so-far/k is exact-rational; the sum is ≤ 10 terms; both
    * engines divide once and round at 6 dp. Singleton labels score 0.
    * One row per vector = input-sized output.
    */
  q("eval_map_at_k", {
    val (bucketCols, unions) = multiLshCandCtes(6, 6)
    s"""WITH bk AS (SELECT vec_id, embedding,
       |       $bucketCols FROM embeddings),
       |     cand AS (
       |  $unions),
       |     scored AS (
       |  SELECT c.a, c.b,
       |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cos
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.a
       |  JOIN embeddings eb ON eb.vec_id = c.b),
       |     edges AS (SELECT a AS qid, b AS nbr, cos FROM scored
       |               UNION ALL SELECT b, a, cos FROM scored),
       |     rk AS (SELECT qid, nbr, CAST(row_number() OVER (
       |              PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rank
       |            FROM edges),
       |     rel AS (SELECT r.qid, r.rank FROM rk r
       |             JOIN embeddings q ON q.vec_id = r.qid
       |             JOIN embeddings nb ON nb.vec_id = r.nbr
       |             WHERE r.rank <= 10 AND q.label = nb.label),
       |     pk AS (SELECT qid, rank,
       |              CAST(count(*) OVER (PARTITION BY qid ORDER BY rank) AS DOUBLE)
       |                / rank AS p_at_k
       |            FROM rel),
       |     ap AS (SELECT qid, sum(p_at_k) AS sum_p, CAST(count(*) AS INTEGER) AS hits
       |            FROM pk GROUP BY qid),
       |     lc AS (SELECT label, CAST(count(*) AS INTEGER) AS n
       |            FROM embeddings GROUP BY label)
       |SELECT e.vec_id AS qid,
       |       coalesce(ap.hits, 0) AS hits,
       |       lc.n - 1 AS n_relevant,
       |       CASE WHEN lc.n - 1 = 0 THEN 0.0
       |            ELSE round(coalesce(ap.sum_p, 0.0) /
       |                       least(lc.n - 1, 10), 6)
       |       END AS ap
       |FROM embeddings e
       |JOIN lc ON lc.label = e.label
       |LEFT JOIN ap ON ap.qid = e.vec_id
       |ORDER BY qid""".stripMargin
  }) { (s, d) =>
    val emb = T(s, d, "embeddings")
    val ranked = knnEdges(emb.select("vec_id", "embedding"), k = 10)
    val labels = emb.select("vec_id", "label")
    val lc = emb.groupBy("label").agg(count(lit(1)).cast("int").as("n"))
    val rel = ranked
      .join(labels.select(col("vec_id").as("qid"), col("label").as("ql")), Seq("qid"))
      .join(labels.select(col("vec_id").as("nbr"), col("label").as("nl")), Seq("nbr"))
      .filter(col("ql") === col("nl"))
      .select("qid", "rank")
    val w = Window.partitionBy("qid").orderBy("rank")
    val ap = rel
      .withColumn("p_at_k", count(lit(1)).over(w).cast("double") / col("rank"))
      .groupBy("qid")
      .agg(sum("p_at_k").as("sum_p"), count(lit(1)).cast("int").as("hits"))
    labels.select(col("vec_id").as("qid"), col("label"))
      .join(broadcast(lc), Seq("label"))
      .join(ap, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("hits"), lit(0)).as("hits"),
        (col("n") - 1).as("n_relevant"),
        when(col("n") - 1 === 0, lit(0.0))
          .otherwise(round(coalesce(col("sum_p"), lit(0.0)) /
            least(col("n") - 1, lit(10)), 6))
          .as("ap"))
      .orderBy("qid") // one row per vector = input-sized
  }

  /** ROUGE-1/ROUGE-2 F1 between adjacent doc pairs (SPEC: Lin 2004 —
    * the RECALL-oriented n-gram overlap summarization eval;
    * [[text_bleu_pairs]]' precision-side twin on the SAME pair scheme
    * and clipped-count machinery, so the two rows together give the
    * standard generation-eval pair). Clipped matches are exact
    * integers; precision/recall/F1 are exact-rational with nullif
    * degenerate guards. Same shuffle shape: per-pair n-gram explode →
    * two-phase counts → equi-join on (pair, gram).
    */
  q("text_rouge_pairs",
    """WITH p AS (
      |  SELECT d1.doc_id AS a, d2.doc_id AS b, d1.text AS ta, d2.text AS tb
      |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      |  WHERE d1.doc_id % 2 = 0),
      |u1a AS (SELECT a, g, count(*) AS c FROM
      |          (SELECT a, unnest(str_split(ta, ' ')) AS g FROM p) GROUP BY a, g),
      |u1b AS (SELECT a, g, count(*) AS c FROM
      |          (SELECT a, unnest(str_split(tb, ' ')) AS g FROM p) GROUP BY a, g),
      |u2a AS (SELECT a, g, count(*) AS c FROM
      |          (SELECT a, unnest([tok[i] || ' ' || tok[i+1]
      |                             FOR i IN range(1, len(tok))]) AS g
      |           FROM (SELECT a, str_split(ta, ' ') AS tok FROM p)) GROUP BY a, g),
      |u2b AS (SELECT a, g, count(*) AS c FROM
      |          (SELECT a, unnest([tok[i] || ' ' || tok[i+1]
      |                             FOR i IN range(1, len(tok))]) AS g
      |           FROM (SELECT a, str_split(tb, ' ') AS tok FROM p)) GROUP BY a, g),
      |m1 AS (SELECT u1a.a, CAST(sum(least(u1a.c, u1b.c)) AS BIGINT) AS m
      |       FROM u1a JOIN u1b ON u1a.a = u1b.a AND u1a.g = u1b.g GROUP BY u1a.a),
      |m2 AS (SELECT u2a.a, CAST(sum(least(u2a.c, u2b.c)) AS BIGINT) AS m
      |       FROM u2a JOIN u2b ON u2a.a = u2b.a AND u2a.g = u2b.g GROUP BY u2a.a),
      |tot AS (SELECT a, b,
      |               CAST(len(str_split(ta, ' ')) AS BIGINT) AS c_len,
      |               CAST(len(str_split(tb, ' ')) AS BIGINT) AS r_len
      |        FROM p),
      |sc AS (SELECT t.a, t.b,
      |              coalesce(m1.m, 0) AS n1, coalesce(m2.m, 0) AS n2,
      |              coalesce(m1.m, 0) * 1.0 / t.r_len AS r1,
      |              coalesce(m1.m, 0) * 1.0 / t.c_len AS pr1,
      |              coalesce(m2.m, 0) * 1.0 / nullif(t.r_len - 1, 0) AS r2,
      |              coalesce(m2.m, 0) * 1.0 / nullif(t.c_len - 1, 0) AS pr2
      |       FROM tot t LEFT JOIN m1 ON m1.a = t.a LEFT JOIN m2 ON m2.a = t.a)
      |SELECT a, b, n1, n2,
      |       round(r1, 6) AS rouge1_recall,
      |       round(2 * pr1 * r1 / nullif(pr1 + r1, 0), 6) AS rouge1_f1,
      |       round(r2, 6) AS rouge2_recall,
      |       round(2 * pr2 * r2 / nullif(pr2 + r2, 0), 6) AS rouge2_f1
      |FROM sc ORDER BY a""") { (s, d) =>
    val docs = T(s, d, "documents")
    val p = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("a"), col("text").as("ta"),
        (col("doc_id") + 1).as("bk"))
      .join(docs.select(col("doc_id").as("bk2"), col("text").as("tb")),
        col("bk") === col("bk2"))
      .select(col("a"), col("bk").as("b"), col("ta"), col("tb"))
      .localCheckpoint()
    def bi(c: String): org.apache.spark.sql.Column = expr(
      s"transform(slice(split($c, ' '), 1, greatest(size(split($c, ' ')) - 1, 0)), " +
        s"(t, i) -> concat(t, ' ', element_at(split($c, ' '), i + 2)))")
    def grams(src: org.apache.spark.sql.Column, tag: String): DataFrame = p
      .select(col("a"), explode(src).as("g"))
      .groupBy("a", "g").agg(count(lit(1)).as(s"c$tag"))
    def matches(ga: DataFrame, gb: DataFrame): DataFrame = ga
      .join(gb, Seq("a", "g"))
      .groupBy("a").agg(sum(least(col("ca"), col("cb"))).cast("long").as("m"))
    val mm1 = matches(grams(split(col("ta"), " "), "a"),
      grams(split(col("tb"), " "), "b")).withColumnRenamed("m", "n1")
    val mm2 = matches(grams(bi("ta"), "a"), grams(bi("tb"), "b"))
      .withColumnRenamed("m", "n2")
    val tot = p.select(col("a"), col("b"),
      size(split(col("ta"), " ")).cast("long").as("c_len"),
      size(split(col("tb"), " ")).cast("long").as("r_len"))
    val sc = tot.join(mm1, Seq("a"), "left").join(mm2, Seq("a"), "left")
      .select(col("a"), col("b"), col("c_len"), col("r_len"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"))
    val r1 = col("n1") * lit(1.0) / col("r_len")
    val pr1 = col("n1") * lit(1.0) / col("c_len")
    val r2 = col("n2") * lit(1.0) / nullif(col("r_len") - 1, lit(0L))
    val pr2 = col("n2") * lit(1.0) / nullif(col("c_len") - 1, lit(0L))
    sc.select(col("a"), col("b"), col("n1"), col("n2"),
      round(r1, 6).as("rouge1_recall"),
      round(lit(2) * pr1 * r1 / nullif(pr1 + r1, lit(0.0)), 6).as("rouge1_f1"),
      round(r2, 6).as("rouge2_recall"),
      round(lit(2) * pr2 * r2 / nullif(pr2 + r2, lit(0.0)), 6).as("rouge2_f1"))
      .orderBy("a") // one row per pair = input-sized
  }

  /** Unicode NFC normalization audit (SPEC: UAX #15 canonical
    * composition — the ingest pass that makes visually-identical
    * strings byte-identical so dedup/tokenization don't split "café"
    * from "café"; C4/CCNet stacks run exactly this before hashing).
    * The corpus text is ASCII, so each doc is DECORATED with a
    * deterministic count of decomposed-accent tokens (e+U+0301,
    * i+U+0308 — real NFD sequences) before the pass: the operator is
    * exercised on strings that genuinely change under NFC, and the
    * composed shrinkage (2 code points per token) is closed-form
    * checkable. The normalization itself is the native codegen'd
    * [[graft.functions.NfcNormalize]] expression (Spark has no
    * builtin; a Scala UDF would drop out of codegen) with DuckDB's own
    * nfc_normalize as the independent oracle twin. Map-only at any
    * scale.
    */
  q("text_unicode_normalize", {
    // NFD by construction: combining acute/diaeresis as explicit escapes
    val tok = " cafe\u0301 nai\u0308ve"
    s"""WITH dec AS (
       |  SELECT doc_id,
       |         text || repeat('$tok', CAST(doc_id % 3 + 1 AS INTEGER)) AS s
       |  FROM documents)
       |SELECT doc_id, CAST(length(s) AS INTEGER) AS len_raw,
       |       CAST(length(nfc_normalize(s)) AS INTEGER) AS len_nfc,
       |       nfc_normalize(s) <> s AS changed
       |FROM dec ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    // NFD by construction: combining acute/diaeresis as explicit escapes
    val tok = " cafe\u0301 nai\u0308ve"
    val nfc = graft.functions.text.nfcNormalize(col("s"))
    T(s, d, "documents")
      .select(col("doc_id"),
        concat(col("text"),
          expr(s"repeat('$tok', cast(doc_id % 3 + 1 as int))")).as("s"))
      .select(col("doc_id"), length(col("s")).cast("int").as("len_raw"),
        length(nfc).cast("int").as("len_nfc"),
        (nfc =!= col("s")).as("changed"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  q("text_redact_pii",
    """SELECT doc_id, redacted, n_emails, n_phones FROM (
      |  SELECT doc_id,
      |         regexp_replace(regexp_replace(pii,
      |           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |           '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted,
      |         len(regexp_extract_all(pii,
      |           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_emails,
      |         len(regexp_extract_all(pii, '\+1-555-[0-9]{4}')) AS n_phones
      |  FROM (SELECT doc_id,
      |          text || ' contact user' || doc_id || '@mail.example.org or +1-555-'
      |               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii
      |        FROM documents) t1) t2
      |ORDER BY doc_id""") { (s, d) =>
    val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    T(s, d, "documents")
      .select(col("doc_id"), concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.org or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("pii"))
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("pii"), lit(emailRe), lit("<EMAIL>")),
          lit(phoneRe), lit("<PHONE>")).as("redacted"),
        // functions-API lit() keeps the regex out of the SQL-literal
        // unescaping layer (expr("'\+...'") would strip the backslash)
        regexp_count(col("pii"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("pii"), lit(phoneRe)).cast("long").as("n_phones"))
      .orderBy("doc_id") // one row per document = input-sized → distributed sort
  }

  /** Language-ID by stopword-hit heuristic: per-language marker token
    * lists; winner = most hits (ties → lexicographic lang). Deterministic
    * and engine-independent, but the marker lists are code not SQL →
    * rows-only check plus a ScalaTest against the `lang` column.
    */
  private val langMarkers = Map(
    "en" -> Seq("the", "and", "of", "to", "value"),
    "de" -> Seq("der", "und", "die", "das", "wert"),
    "es" -> Seq("el", "la", "los", "de", "valor"),
    "fr" -> Seq("le", "la", "les", "et", "valeur"),
    "zh" -> Seq("shu", "ju", "biao", "lie", "zhi"))

  /** Marker-hit language prediction over any DataFrame with a `text`
    * column; winner = most marker hits, ties → lexicographically last
    * (deterministic). Purely map-side.
    */
  def langIdOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = langMarkers.toSeq.sortBy(_._1).foldLeft(docs) {
      case (acc, (lang, ms)) =>
        acc.withColumn(s"sc_$lang", size(filter(toks, t => t.isin(ms: _*))))
    }
    val best = langMarkers.keys.toSeq.sorted
      .map(l => struct(col(s"sc_$l").as("score"), lit(l).as("lang")))
    scored
      .withColumn("pred", sort_array(array(best: _*), asc = false)(0).getField("lang"))
      .drop(langMarkers.keys.toSeq.sorted.map(l => s"sc_$l"): _*)
  }

  q("text_lang_id",
    """WITH sc AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(str_split(text,' '), t -> t IN ('the','and','of','to','value'))) AS s_en,
      |    len(list_filter(str_split(text,' '), t -> t IN ('der','und','die','das','wert'))) AS s_de,
      |    len(list_filter(str_split(text,' '), t -> t IN ('el','la','los','de','valor'))) AS s_es,
      |    len(list_filter(str_split(text,' '), t -> t IN ('le','la','les','et','valeur'))) AS s_fr,
      |    len(list_filter(str_split(text,' '), t -> t IN ('shu','ju','biao','lie','zhi'))) AS s_zh
      |  FROM documents)
      |SELECT doc_id, lang,
      |  (list_sort([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
      |              {'score': s_es, 'lang': 'es'}, {'score': s_fr, 'lang': 'fr'},
      |              {'score': s_zh, 'lang': 'zh'}], 'DESC'))[1].lang AS pred
      |FROM sc ORDER BY doc_id""") { (s, d) =>
    langIdOf(T(s, d, "documents"))
      .select(col("doc_id"), col("lang"), col("pred"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Language-ID confusion matrix + per-language recall — the eval
    * report that turns [[text_lang_id]] from a predictor into a
    * MEASURED predictor (the fastText/CLD quality-sheet shape every
    * multilingual ingest pins before trusting lang routing): per
    * (true lang, predicted lang) cell count and the share of the true
    * language's docs it captures. Integer counts from one two-phase
    * aggregate over the map-side predictions; share is one fixed
    * ratio (rule 5). |langs|² output at any scale.
    */
  q("text_lang_confusion",
    """WITH sc AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(str_split(text,' '), t -> t IN ('the','and','of','to','value'))) AS s_en,
      |    len(list_filter(str_split(text,' '), t -> t IN ('der','und','die','das','wert'))) AS s_de,
      |    len(list_filter(str_split(text,' '), t -> t IN ('el','la','los','de','valor'))) AS s_es,
      |    len(list_filter(str_split(text,' '), t -> t IN ('le','la','les','et','valeur'))) AS s_fr,
      |    len(list_filter(str_split(text,' '), t -> t IN ('shu','ju','biao','lie','zhi'))) AS s_zh
      |  FROM documents),
      |pr AS (
      |  SELECT lang,
      |    (list_sort([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
      |                {'score': s_es, 'lang': 'es'}, {'score': s_fr, 'lang': 'fr'},
      |                {'score': s_zh, 'lang': 'zh'}], 'DESC'))[1].lang AS pred
      |  FROM sc),
      |tot AS (SELECT lang, count(*) AS t FROM pr GROUP BY 1)
      |SELECT pr.lang, pr.pred, CAST(count(*) AS BIGINT) AS n,
      |       round(count(*) * 1.0 / any_value(tot.t), 6) AS share,
      |       pr.lang = pr.pred AS correct
      |FROM pr JOIN tot ON tot.lang = pr.lang
      |GROUP BY pr.lang, pr.pred ORDER BY pr.lang, pr.pred""".stripMargin) { (s, d) =>
    val pred = langIdOf(T(s, d, "documents")).select("lang", "pred")
    val tot = pred.groupBy("lang").agg(count(lit(1)).as("t"))
    pred.groupBy("lang", "pred").agg(count(lit(1)).as("n"))
      .join(tot, Seq("lang"))
      .select(col("lang"), col("pred"), col("n"),
        round(col("n") * lit(1.0) / col("t"), 6).as("share"),
        (col("lang") === col("pred")).as("correct"))
      .orderBy("lang", "pred") // |langs|^2 output = constant-sized
  }

  /** Language-ID by character-bigram profile (the mandate's "n-gram
    * heuristic" literally): per-language characteristic char bigrams;
    * score = overlapping bigram hits in the text, winner = argmax
    * (ties → lexicographically last, same rule as the marker variant).
    */
  private val langBigrams = Map(
    "en" -> Seq("th", "he", "an", "in", "er"),
    "de" -> Seq("ch", "ei", "de", "un", "ie"),
    "es" -> Seq("os", "la", "el", "ar", "or"),
    "fr" -> Seq("le", "ou", "ai", "eu", "et"),
    "zh" -> Seq("sh", "zh", "ng", "ao", "ui"))

  q("text_lang_id_ngram", {
    val scores = langBigrams.toSeq.sortBy(_._1).map { case (l, bs) =>
      val inList = bs.map(b => s"'$b'").mkString(", ")
      s"len(list_filter([substr(text, i, 2) FOR i IN range(1, length(text))], b -> b IN ($inList))) AS s_$l"
    }.mkString(",\n      |    ")
    val structs = langBigrams.keys.toSeq.sorted
      .map(l => s"{'score': s_$l, 'lang': '$l'}").mkString(", ")
    s"""WITH sc AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM documents)
       |SELECT doc_id, lang,
       |  (list_sort([$structs], 'DESC'))[1].lang AS pred
       |FROM sc ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    val chars = split(col("text"), "")
    val n1 = greatest(size(chars) - 1, lit(0))
    val bigrams = zip_with(slice(chars, lit(1), n1), slice(chars, lit(2), n1),
      (x, y) => concat(x, y))
    val scored = langBigrams.toSeq.sortBy(_._1).foldLeft(T(s, d, "documents")) {
      case (acc, (lang, bs)) =>
        acc.withColumn(s"sc_$lang", size(filter(bigrams, b => b.isin(bs: _*))))
    }
    val best = langBigrams.keys.toSeq.sorted
      .map(l => struct(col(s"sc_$l").as("score"), lit(l).as("lang")))
    scored
      .withColumn("pred", sort_array(array(best: _*), asc = false)(0).getField("lang"))
      .select(col("doc_id"), col("lang"), col("pred"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Document fingerprint: rolling polynomial hash over tokens, each
    * token hashed as a char-codepoint polynomial — deterministic,
    * order-sensitive, and (unlike Murmur3) expressible in both engines,
    * so the fingerprint is oracle-checked bit-for-bit. All arithmetic
    * stays under mod 1e9+7, so acc*mult fits a Long under ANSI mode.
    */
  q("text_fingerprint",
    """SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(str_split(text, ' '), t ->
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(str_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
      |        (a, b) -> (a * 31 + b) % 1000000007))),
      |    (acc, h) -> (acc * 1000003 + h) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    T(s, d, "documents")
      // per-token hashes via the native codegen'd expression; the outer
      // fold over ~1e2 token hashes stays a (cheap) HOF
      .withColumn("fp", aggregate(
        graft.functions.text.tokenPolyHash(split(col("text"), " ")), lit(0L),
        (acc, h) => pmod(acc * lit(1000003L) + h, lit(1000000007L))))
      .select("doc_id", "fp")
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Curriculum ordering (SPEC: curriculum-learning data ordering —
    * Bengio et al. 2009 easy-to-hard; in LLM pipelines a deterministic
    * global ordering by a difficulty/quality score that the packing
    * stage consumes): a TOTAL global rank over (score, doc_id). The
    * naive `row_number() OVER (ORDER BY …)` moves the corpus through
    * ONE task; this uses the two-pass range-bucket rank (WindowOps
    * ntile machinery, generalized): range partitions + intra-bucket
    * rank + an O(#partitions) offset broadcast. No single-partition
    * exchange at any size.
    */
  q("pipeline_curriculum_order",
    """SELECT doc_id,
      |       CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
      |         AS curriculum_rank
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    WindowOps.globalRowNumber(
      T(s, d, "documents").select("doc_id", "n_chars"),
      Seq(col("n_chars").asc, col("doc_id").asc))
      .select(col("doc_id"), col("global_rank").as("curriculum_rank"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Source-interleaved training order — round-robin across sources
    * (doc k of every source before doc k+1 of any source): the
    * source-balanced ordering that keeps a mixed corpus from feeding
    * one domain in a block when sources have very different sizes.
    * ONE window for the within-source rank (partitioned on source —
    * source-sized sorts, no global exchange), then the interleave
    * position is a TOTAL global rank over (within-rank, source) via
    * the same two-pass range-bucket machinery as curriculum/epoch
    * ordering — no single-partition exchange at any size.
    */
  q("pipeline_interleave_sources",
    """WITH r AS (SELECT doc_id, source,
      |                  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |           FROM documents)
      |SELECT doc_id, source,
      |       CAST(row_number() OVER (ORDER BY rn, source) AS BIGINT) AS pos
      |FROM r ORDER BY doc_id""") { (s, d) =>
    val w = Window.partitionBy("source").orderBy("doc_id")
    val ranked = T(s, d, "documents").select("doc_id", "source")
      .withColumn("rn", row_number().over(w))
    WindowOps.globalRowNumber(ranked, Seq(col("rn").asc, col("source").asc))
      .select(col("doc_id"), col("source"), col("global_rank").as("pos"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Dataset card — the per-(lang, source) corpus summary a curation
    * run publishes alongside the data (docs, token totals, length
    * stats) with ROLLUP subtotals and grand total. One pass, one
    * grouping-sets aggregate; the token count is the same whitespace
    * tokenization every text operator uses.
    */
  q("pipeline_dataset_card",
    """SELECT lang, source, count(*) AS n_docs,
      |       CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens,
      |       round(avg(n_chars), 6) AS avg_chars
      |FROM documents GROUP BY ROLLUP(lang, source)
      |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""") { (s, d) =>
    T(s, d, "documents")
      .rollup("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        round(avg("n_chars"), 6).as("avg_chars"))
      .reportSorted(col("lang").asc_nulls_first, col("source").asc_nulls_first)
  }

  /** Deterministic epoch shuffle — reproducible training order: a
    * hash-keyed global permutation (every re-run, every re-ingestion
    * yields the SAME order, unlike rand()-based shuffles). The rank is
    * the same two-pass range-bucket machinery as curriculum ordering —
    * no single-partition exchange. The LCG keeps the key
    * oracle-expressible; a production corpus with >2³² ids swaps in
    * xxhash64 with no shape change.
    */
  q("pipeline_epoch_shuffle",
    """SELECT doc_id,
      |       CAST(row_number() OVER (
      |         ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS BIGINT)
      |         AS shuffle_rank
      |FROM documents ORDER BY doc_id""") { (s, d) =>
    val h = pmod(col("doc_id") * lit(1103515245L) + lit(12345L), lit(2147483648L))
    WindowOps.globalRowNumber(
      T(s, d, "documents").select("doc_id").withColumn("h", h),
      Seq(col("h").asc, col("doc_id").asc))
      .select(col("doc_id"), col("global_rank").as("shuffle_rank"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Per-group exact percentiles (continuous interpolation — matches
    * DuckDB quantile_cont). At 100 TB the same query swaps in
    * `approx_percentile` (KLL-style sketch, fixed-size state, same call
    * shape) — exact is registered because it oracle-verifies.
    */
  q("agg_percentile",
    """SELECT lang,
      |       round(quantile_cont(n_chars, 0.5), 4) AS p50,
      |       round(quantile_cont(n_chars, 0.95), 4) AS p95
      |FROM documents GROUP BY lang ORDER BY lang""") { (s, d) =>
    T(s, d, "documents")
      .groupBy("lang")
      .agg(round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_chars, 0.95)"), 4).as("p95"))
      .reportSorted("lang")
  }

  /** The sketch path agg_percentile's scaladoc promises: a fixed-grid
    * histogram quantile sketch — DDSketch (Masson et al., VLDB 2019)
    * with a linear δ=8 mapping, the deterministic cousin of KLL /
    * `approx_percentile`. Bucket = value div δ is pure integer
    * arithmetic and counts are SUMS, so unlike the built-in's
    * rank-summary compaction the sketch is merge-order-free and
    * HASH-CHECKED since round 11 (the built-in row it replaces was
    * rows-only by construction). Estimate = midpoint of the first
    * bucket whose cumulative count reaches ⌈q·n⌉ → absolute error
    * ≤ δ (accuracy also pinned vs exact in PlanInvariantsSpec; swap
    * the grid for log-γ buckets for relative error on unbounded
    * ranges). Scale: one (group, bucket) two-phase count — shuffle
    * ∝ occupied buckets (range/δ per group), the cumulative window
    * runs over that bucket table, never the raw rows.
    */
  q("agg_approx_percentile",
    """WITH bc AS (SELECT lang, n_chars // 8 AS b, count(*) AS c
      |            FROM documents GROUP BY lang, n_chars // 8),
      |     cum AS (SELECT lang, b, c,
      |               CAST(sum(c) OVER (PARTITION BY lang ORDER BY b) AS BIGINT) AS cum,
      |               CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n
      |             FROM bc)
      |SELECT lang,
      |       min(CASE WHEN cum >= ceil(CAST(0.5 AS DOUBLE) * n) THEN b * 8 + 4 END) AS p50,
      |       min(CASE WHEN cum >= ceil(CAST(0.95 AS DOUBLE) * n) THEN b * 8 + 4 END) AS p95
      |FROM cum GROUP BY lang ORDER BY lang""") { (s, d) =>
    val bc = T(s, d, "documents")
      .groupBy(col("lang"), expr("n_chars div 8").as("b"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("lang").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
    val cum = bc
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
    cum.groupBy("lang")
      .agg(
        min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("b") * 8 + 4)).as("p50"),
        min(when(col("cum") >= ceil(lit(0.95) * col("n")), col("b") * 8 + 4)).as("p95"))
      .reportSorted("lang")
  }

  /** Capstone composition: the whole training-set selection runs as ONE
    * lazy plan — language slice → quality gates → exact-dedup keeping
    * the lowest doc_id → embedding join — so Catalyst prunes/pushes
    * across stage boundaries instead of materializing between steps
    * (the reference's pandas workflow materializes after every one).
    */
  q("pipeline_training_set",
    """WITH filtered AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE lang = 'en' AND n_chars BETWEEN 50 AND 1000
      |    AND len(str_split(text, ' ')) >= 10),
      |     kept AS (
      |  SELECT min(doc_id) AS doc_id FROM filtered GROUP BY lower(trim(text)))
      |SELECT k.doc_id, CAST(len(e.embedding) AS INTEGER) AS dim
      |FROM kept k JOIN embeddings e ON k.doc_id = e.vec_id
      |ORDER BY k.doc_id""") { (s, d) =>
    val filtered = T(s, d, "documents")
      .filter(col("lang") === "en" && col("n_chars").between(50, 1000) &&
        size(split(col("text"), " ")) >= 10)
    val kept = filtered
      .groupBy(sha2(lower(trim(col("text"))), 256))
      .agg(min("doc_id").as("doc_id"))
    kept.join(T(s, d, "embeddings"), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), size(col("embedding")).as("dim"))
      .orderBy("doc_id") // one row per kept doc = input-sized
  }

  /** Deterministic stratified sampling: per-language keep rates, keyed
    * on the CONTENT fingerprint (not doc_id), so the same document
    * samples identically across re-partitions, re-runs, and even
    * re-ingestions under new ids — the reproducibility property a
    * training-data pipeline needs. Map-side only; no RNG state.
    */
  q("pipeline_stratified_sample",
    """WITH fp AS (
      |  SELECT doc_id, lang,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(str_split(text, ' '), t ->
      |        list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(str_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
      |          (a, b) -> (a * 31 + b) % 1000000007))),
      |      (acc, h) -> (acc * 1000003 + h) % 1000000007) % 100 AS bucket
      |  FROM documents)
      |SELECT doc_id, lang FROM fp
      |WHERE bucket < (CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 ELSE 10 END)
      |ORDER BY doc_id""") { (s, d) =>
    T(s, d, "documents")
      .withColumn("bucket", aggregate(
        graft.functions.text.tokenPolyHash(split(col("text"), " ")), lit(0L),
        (acc, h) => pmod(acc * lit(1000003L) + h, lit(1000000007L))) % 100)
      .filter(col("bucket") <
        when(col("lang") === "en", 50).when(col("lang") === "de", 30).otherwise(10))
      .select("doc_id", "lang")
      .orderBy("doc_id") // one row per sampled doc = input-sized
  }

  /** Sequence packing: assign docs to fixed token-budget bins (4096)
    * per language in deterministic doc_id order — the standard
    * context-window packing pass before tokenized training shards are
    * written. One window cumsum per language partition; bin boundaries
    * are a pure function of the running total, so packing is stable
    * under any physical partitioning.
    */
  q("pipeline_pack_sequences",
    """SELECT doc_id, lang,
      |       CAST((cum - n_tok) // 4096 AS BIGINT) AS bin
      |FROM (SELECT doc_id, lang, len(str_split(text, ' ')) AS n_tok,
      |             sum(len(str_split(text, ' ')))
      |               OVER (PARTITION BY lang ORDER BY doc_id) AS cum
      |      FROM documents) t
      |ORDER BY doc_id""") { (s, d) =>
    val w = Window.partitionBy("lang").orderBy("doc_id")
    T(s, d, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("lang"),
        floor((col("cum") - col("n_tok")) / 4096).as("bin"))
      .orderBy("doc_id")
  }

  /** BERT-style MLM masking (Devlin et al. 2019 §3.1: select 15% of
    * tokens; of those, 80% → [MASK], 10% → a random token, 10% kept —
    * the masked-LM data prep beside [[pipeline_span_corruption]]'s T5
    * spans, completing the two standard denoising objectives). Same
    * DETERMINISTIC discipline as the span row: selection and the
    * 80/10/10 split derive from the contentBucket polynomial
    * h = ((doc_id mod P)·1000003 + j) mod P (P = 1e9+7) — h mod 20 < 3
    * selects 15%, (h div 20) mod 10 splits 1/1/8 — and the "random"
    * replacement is the doc's own token at the derived position
    * (j·7 mod n)+1, so every byte is re-ingestion-stable and
    * SQL-replayable where real RNG would reproduce across neither
    * engines nor reruns. Pure per-row HOF array algebra in whole-stage
    * codegen: no explode, no shuffle, map-only at any scale.
    */
  q("pipeline_mlm_masking",
    """WITH tk AS (SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
      |a AS (SELECT doc_id, tok, len(tok) AS n,
      |        [ CASE WHEN (((doc_id % 1000000007) * 1000003 + j) % 1000000007) % 20 < 3
      |               THEN CASE (((((doc_id % 1000000007) * 1000003 + j) % 1000000007)) // 20) % 10
      |                    WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END
      |               ELSE 0 END
      |          FOR j IN range(1, len(tok) + 1) ] AS act
      |      FROM tk)
      |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
      |       CAST(len([x FOR x IN act IF x > 0]) AS INTEGER) AS n_selected,
      |       CAST(len([x FOR x IN act IF x = 3]) AS INTEGER) AS n_mask,
      |       CAST(len([x FOR x IN act IF x = 2]) AS INTEGER) AS n_random,
      |       CAST(len([x FOR x IN act IF x = 1]) AS INTEGER) AS n_keep,
      |       array_to_string([ CASE act[j] WHEN 3 THEN '[MASK]'
      |                              WHEN 2 THEN tok[(j * 7) % n + 1]
      |                              ELSE tok[j] END
      |                         FOR j IN range(1, n + 1) ], ' ') AS masked_text
      |FROM a ORDER BY doc_id""".stripMargin) { (s, d) =>
    T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .withColumn("n", size(col("tok")))
      .withColumn("act", expr(
        """transform(tok, (t, i) ->
          |  CASE WHEN (((doc_id % 1000000007L) * 1000003L + i + 1) % 1000000007L) % 20 < 3
          |       THEN CASE (((((doc_id % 1000000007L) * 1000003L + i + 1) % 1000000007L)) div 20) % 10
          |            WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END
          |       ELSE 0 END)""".stripMargin))
      .select(col("doc_id"), col("n").cast("int").as("n_tokens"),
        expr("cast(size(filter(act, x -> x > 0)) as int)").as("n_selected"),
        expr("cast(size(filter(act, x -> x = 3)) as int)").as("n_mask"),
        expr("cast(size(filter(act, x -> x = 2)) as int)").as("n_random"),
        expr("cast(size(filter(act, x -> x = 1)) as int)").as("n_keep"),
        expr(
          """array_join(transform(tok, (t, i) ->
            |  CASE element_at(act, i + 1)
            |       WHEN 3 THEN '[MASK]'
            |       WHEN 2 THEN element_at(tok, cast(((i + 1) * 7) % n as int) + 1)
            |       ELSE t END), ' ')""".stripMargin).as("masked_text"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4: replace
    * token spans with numbered sentinels, emit (input, target) pairs
    * — THE denoising-objective data prep). The span placement is a
    * DETERMINISTIC variant built for re-ingestion stability and SQL
    * replay: tokens partition into blocks of 8; a block is selected
    * iff ((doc_id mod P)·1000003 + block) mod P mod 4 = 0 with
    * P = 1e9+7 (the contentBucket polynomial device — pure integer
    * arithmetic both engines compute identically; T5's RNG spans
    * would be unreproducible across engines AND across re-runs),
    * and a selected block masks its positions 2–4 — spans are
    * non-overlapping BY CONSTRUCTION, ~25% of blocks → ~9.4% of
    * tokens, mean span 3 (T5 defaults: 15%, mean 3). Sentinel k =
    * rank of the block among the doc's masked blocks. Everything is
    * per-row higher-order-function array algebra inside whole-stage
    * codegen — NO explode, NO shuffle, NO collect: the corpus pass is
    * map-only, the ideal 100 TB shape (the output sort is the only
    * exchange and is input-sized). Mod arithmetic pre-reduces doc_id
    * so no intermediate exceeds 1e15 (DuckDB errors on BIGINT
    * overflow where Spark wraps — the shared-reduction keeps both
    * engines in safe range at any doc_id).
    */
  q("pipeline_span_corruption",
    """WITH tk AS (SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
      |m AS (SELECT doc_id, tok, len(tok) AS n,
      |        [ (((doc_id % 1000000007) * 1000003 + ((j-1) // 8)) % 1000000007) % 4 = 0
      |            AND ((j-1) % 8) BETWEEN 2 AND 4
      |          FOR j IN range(1, len(tok) + 1) ] AS msk
      |      FROM tk),
      |b AS (SELECT *,
      |        [ (j-1) // 8 FOR j IN range(1, n + 1)
      |          IF msk[j] AND ((j-1) % 8) = 2 ] AS blocks
      |      FROM m)
      |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
      |  CAST(len([ j FOR j IN range(1, n + 1) IF msk[j] ]) AS INTEGER) AS n_masked,
      |  CAST(len(blocks) AS INTEGER) AS n_spans,
  -- coalesce: array_to_string(empty) is NULL in DuckDB, concat_ws is ''
      |  coalesce(array_to_string(
      |    [ CASE WHEN NOT msk[j] THEN tok[j]
      |           ELSE '<extra_id_' ||
      |                CAST(list_position(blocks, (j-1) // 8) - 1 AS VARCHAR) || '>'
      |      END
      |      FOR j IN range(1, n + 1) IF (NOT msk[j]) OR ((j-1) % 8) = 2 ], ' '), '')
      |    AS input_text,
      |  coalesce(array_to_string(
      |    [ CASE WHEN ((j-1) % 8) = 2
      |           THEN '<extra_id_' ||
      |                CAST(list_position(blocks, (j-1) // 8) - 1 AS VARCHAR) ||
      |                '> ' || tok[j]
      |           ELSE tok[j] END
      |      FOR j IN range(1, n + 1) IF msk[j] ], ' '), '') AS target_text
      |FROM b ORDER BY doc_id""") { (s, d) =>
    T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .withColumn("zz", expr(
        """transform(tok, (t, i) -> struct(t as t, i as i,
          |  (((doc_id % 1000000007) * 1000003 + (i div 8)) % 1000000007) % 4 = 0
          |    and (i % 8) between 2 and 4 as m))""".stripMargin))
      .withColumn("blocks",
        expr("transform(filter(zz, x -> x.m and x.i % 8 = 2), x -> x.i div 8)"))
      .select(col("doc_id"),
        size(col("tok")).cast("int").as("n_tokens"),
        expr("cast(size(filter(zz, x -> x.m)) as int)").as("n_masked"),
        expr("cast(size(blocks) as int)").as("n_spans"),
        expr("""concat_ws(' ', transform(filter(zz, x -> not x.m or x.i % 8 = 2),
          |  x -> case when not x.m then x.t
          |            else concat('<extra_id_',
          |              cast(array_position(blocks, x.i div 8) - 1 as string), '>')
          |       end))""".stripMargin).as("input_text"),
        expr("""concat_ws(' ', transform(filter(zz, x -> x.m),
          |  x -> case when x.i % 8 = 2
          |            then concat('<extra_id_',
          |              cast(array_position(blocks, x.i div 8) - 1 as string), '> ', x.t)
          |            else x.t
          |       end))""".stripMargin).as("target_text"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Fill-in-the-middle transform (SPEC: Bavarian et al. 2022 "FIM" —
    * split each training document at two points and emit the
    * PSM-format <PRE>prefix<SUF>suffix<MID>middle string, teaching an
    * autoregressive model to infill; applied at the paper's 50% rate,
    * the rest pass through verbatim). Selection AND both cut points
    * come from the contentBucket polynomial (the span-corruption
    * device: pure pre-reduced integer arithmetic both engines compute
    * identically — FIM's RNG cuts would be unreproducible across
    * engines and re-ingestions; multipliers keep every intermediate
    * ≤ 10¹⁷, inside DuckDB's checked-BIGINT range). The middle may be
    * legitimately empty when the cuts coincide — the paper keeps those
    * as trivial infill examples. Pure per-row array slicing inside
    * whole-stage codegen: NO explode, NO shuffle — a map-only corpus
    * pass at any scale (the output sort is the only, input-sized,
    * exchange).
    */
  q("pipeline_fim",
    """WITH tk AS (SELECT doc_id, str_split(text, ' ') AS tok,
      |             len(str_split(text, ' ')) AS n,
      |             (doc_id % 1000000007) % 2 = 0 AS sel FROM documents),
      |c AS (SELECT *,
      |        CAST(((doc_id % 1000000007) * 1000003 % 1000000007) % n AS BIGINT) AS c1,
      |        CAST(((doc_id % 1000000007) * 73856093 % 1000000007) % n AS BIGINT) AS c2
      |      FROM tk)
      |SELECT doc_id,
      |       CASE WHEN sel THEN 'psm' ELSE 'plain' END AS mode,
      |       CAST(n AS INTEGER) AS n_tokens,
      |       CAST(CASE WHEN sel THEN least(c1, c2) END AS INTEGER) AS cut_lo,
      |       CAST(CASE WHEN sel THEN greatest(c1, c2) END AS INTEGER) AS cut_hi,
      |       CASE WHEN NOT sel THEN array_to_string(tok, ' ')
      |            ELSE '<PRE> ' ||
      |                 coalesce(array_to_string(tok[1:least(c1, c2)], ' '), '') ||
      |                 ' <SUF> ' ||
      |                 coalesce(array_to_string(tok[greatest(c1, c2) + 1:n], ' '), '') ||
      |                 ' <MID> ' ||
      |                 coalesce(array_to_string(
      |                   tok[least(c1, c2) + 1:greatest(c1, c2)], ' '), '')
      |       END AS text_out
      |FROM c ORDER BY doc_id""") { (s, d) =>
    T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .withColumn("n", size(col("tok")))
      .withColumn("sel", (col("doc_id") % 1000000007L) % 2 === 0)
      .withColumn("c1",
        expr("(doc_id % 1000000007L) * 1000003L % 1000000007L % n"))
      .withColumn("c2",
        expr("(doc_id % 1000000007L) * 73856093L % 1000000007L % n"))
      .withColumn("lo", least(col("c1"), col("c2")))
      .withColumn("hi", greatest(col("c1"), col("c2")))
      .select(col("doc_id"),
        when(col("sel"), "psm").otherwise("plain").as("mode"),
        col("n").cast("int").as("n_tokens"),
        when(col("sel"), col("lo")).cast("int").as("cut_lo"),
        when(col("sel"), col("hi")).cast("int").as("cut_hi"),
        when(!col("sel"), concat_ws(" ", col("tok")))
          .otherwise(concat(
            lit("<PRE> "),
            concat_ws(" ", expr("slice(tok, 1, cast(lo as int))")),
            lit(" <SUF> "),
            concat_ws(" ", expr("slice(tok, cast(hi as int) + 1, cast(n - hi as int))")),
            lit(" <MID> "),
            concat_ws(" ", expr("slice(tok, cast(lo as int) + 1, cast(hi - lo as int))"))))
          .as("text_out"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Benchmark decontamination: drop training documents sharing ANY
    * 8-token n-gram with the held-out eval slice (doc_id % 97 == 0
    * stands in for the benchmark set; in production it's a separate
    * table). The standard shape: eval n-grams are a SMALL distinct set
    * (broadcast semi-join against it), train-side grams are joined by
    * 64-bit hash — equality of xxhash64 keys ≡ equality of the n-gram
    * strings w.h.p. (collision odds ~n²/2⁶⁵), with ~8-byte shuffle
    * keys. The DuckDB oracle joins on the strings themselves, so a
    * hash-semantics bug cannot pass. Output = the clean training ids.
    */
  q("pipeline_decontaminate",
    """WITH tok AS (SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
      |     grams AS (
      |  SELECT doc_id, unnest([list_aggr(tok[i:i+7], 'string_agg', ' ')
      |                         FOR i IN range(1, greatest(len(tok) - 7, 1) + 1)]) AS g
      |  FROM tok),
      |     ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
      |     bad AS (SELECT DISTINCT doc_id FROM grams
      |             WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM ev))
      |SELECT doc_id FROM documents
      |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
      |ORDER BY doc_id""") { (s, d) =>
    val grams = T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, greatest(size(tok) - 8, 0)), i -> xxhash64(concat_ws(' ', slice(tok, i + 1, 8))))")).as("g"))
    val evalGrams = grams.filter(col("doc_id") % 97 === 0).select("g").distinct()
    val contaminated = grams.filter(col("doc_id") % 97 =!= 0)
      .join(evalGrams, Seq("g"), "left_semi")
      .select("doc_id").distinct()
    T(s, d, "documents")
      .filter(col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id")
      .orderBy("doc_id") // one row per clean training doc = input-sized
  }

  /** The DSIR vocabulary artifact: top-V raw unigrams with their
    * dy20-snapped add-1-smoothed log importance ratio
    * ln p_target(w) − ln p_raw(w). Computed ONCE per (corpus) by a
    * plan-build-time job (vocab-sized top-K collect — the BPE-artifact
    * pattern) and shared by the registered query AND the
    * data-parameterized oracle, so both engines sum IDENTICAL grid
    * values. Exactness chain: counts are integers; products (c+1)·(T+V)
    * stay < 2⁵³ so the toDouble is exact, the division correctly
    * rounded, Math.log deterministic on identical bits, and the dy20
    * snap makes every later per-doc sum order-free.
    */
  private[ops] def dsirVocab(s: SparkSession, d: String,
      v: Int = 256): Array[(String, Double)] = {
    val tk = T(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
    val isTgt = col("lang") === "en" && col("source").isin("src0", "src1")
    val cnt = tk.groupBy("tok")
      .agg(count(lit(1)).as("cr"),
        sum(when(isTgt, 1L).otherwise(0L)).as("ct"))
    val top = cnt.orderBy(col("cr").desc, col("tok").asc).limit(v).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val tr = top.map(_._2).sum; val tt = top.map(_._3).sum
    top.map { case (w, cr, ct) =>
      val ratio = ((ct + 1) * (tr + v)).toDouble / ((cr + 1) * (tt + v))
      (w, Grid.dy20D(math.log(ratio)))
    }
  }

  /** Data Selection via Importance Resampling (SPEC: Xie, Santurkar,
    * Ma & Liang 2023 "DSIR" — score every raw document by the hashed
    * n-gram importance ratio log p_target/p_raw between a small
    * high-quality target slice and the raw pool, keep the
    * positive-evidence documents; the pretraining-data selection
    * method behind DoReMi-era corpora; unigram features here, the
    * paper's hashed-bigram slot is the same join). The deterministic
    * selection variant keeps docs with ABOVE-MEAN importance — DSIR's
    * Gumbel-noise top-k would be engine-irreproducible, and the mean
    * is the one order statistic that stays exact (per-doc sums of grid
    * values → a grand sum that is itself order-free exact, one exact
    * division). Shape: the vocab artifact is a V-row broadcast; the
    * corpus pass is ONE tokens⋈vocab join + per-doc aggregate
    * (grid-exact sums) + a left join back so zero-match docs score 0 +
    * a 1-row mean broadcast — no global sort, no collect over data.
    * The oracle embeds the same artifact as a VALUES table and replays
    * every sum bit-for-bit.
    */
  qDyn("pipeline_dsir") { (s, d) =>
    val vocab = dsirVocab(s, d)
    import s.implicits._
    val vdf = broadcast(vocab.toSeq.toDF("vtok", "llr"))
    val docs = T(s, d, "documents")
    val a = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .join(vdf, col("tok") === col("vtok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("nv"), sum("llr").as("lw"))
    // checkpoint: the mean is a second consumer — without it Spark
    // re-runs the whole scoring join for the 1-row aggregate (seen in
    // the r14 plan audit), doubling the corpus pass at any scale
    val sc = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("int").as("n_tokens"))
      .join(a, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("nv"), lit(0L)).as("n_in_vocab"),
        coalesce(col("lw"), lit(0.0)).as("lw"))
      .localCheckpoint()
    val m = sc.agg((sum("lw") / count(lit(1))).as("mlw"))
    sc.crossJoin(broadcast(m))
      .select(col("doc_id"), col("n_tokens"), col("n_in_vocab"),
        round(col("lw"), 6).as("logw"),
        (col("lw") > col("mlw")).as("keep"))
      .orderBy("doc_id") // one row per doc = input-sized
  } { (s, d) =>
    val vals = dsirVocab(s, d)
      .map { case (w, l) => s"('${w.replace("'", "''")}', CAST($l AS DOUBLE))" }
      .mkString(",\n        ")
    s"""WITH v(vtok, llr) AS (VALUES
       |        $vals),
       |tk AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
       |a AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS nv, sum(v.llr) AS lw
       |      FROM tk t JOIN v ON t.tok = v.vtok GROUP BY 1),
       |sc AS (SELECT d.doc_id,
       |              CAST(len(str_split(d.text, ' ')) AS INTEGER) AS n_tokens,
       |              coalesce(a.nv, 0) AS nv, coalesce(a.lw, 0.0) AS lw
       |       FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id),
       |m AS (SELECT sum(lw) / count(*) AS mlw FROM sc)
       |SELECT sc.doc_id, sc.n_tokens, sc.nv AS n_in_vocab,
       |       round(sc.lw, 6) AS logw, sc.lw > m.mlw AS keep
       |FROM sc, m ORDER BY sc.doc_id""".stripMargin
  }

  /** Line-level boilerplate removal (SPEC: the C4/RefinedWeb curation
    * pass that strips lines repeated across many pages — nav bars,
    * cookie banners, license footers — while keeping the documents):
    * split each doc into units, drop every unit that occurs in ≥ 4
    * distinct documents, reassemble the survivors in order. The
    * corpus has no newlines, so the unit here is a fixed 10-token
    * chunk — the splitter is the pluggable slot (swap in split('\n')
    * on real web text); everything downstream is unit-agnostic.
    * Shape: one chunk-vocabulary-sized distinct-doc count, one
    * postings-sized join back (the boilerplate list is unhinted — AQE
    * broadcasts it while it fits), then ONE per-doc aggregate whose
    * in-order reassembly is an array_sort over the doc's own chunks —
    * bounded by doc length, no window, no global sort. At 100 TB every
    * shuffle is chunk-vocab- or doc-sized, never token-sized.
    */
  q("pipeline_remove_boilerplate",
    """WITH tk AS (SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
      |     ch AS (
      |  SELECT doc_id, u.idx AS idx, u.chunk AS chunk FROM (
      |    SELECT doc_id,
      |           unnest([{'idx': i, 'chunk': array_to_string(tok[i*10+1:i*10+10], ' ')}
      |                   FOR i IN range(0, CAST(ceil(len(tok) / 10.0) AS INT))]) AS u
      |    FROM tk) t),
      |     dfq AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM ch GROUP BY 1)
      |SELECT c.doc_id,
      |       CAST(count(*) AS INTEGER) AS n_chunks,
      |       CAST(count(*) FILTER (WHERE f.df >= 4) AS INTEGER) AS n_removed,
      |       coalesce(string_agg(c.chunk, ' ' ORDER BY c.idx)
      |                  FILTER (WHERE f.df < 4), '') AS clean_text
      |FROM ch c JOIN dfq f USING (chunk)
      |GROUP BY c.doc_id ORDER BY c.doc_id""") { (s, d) =>
    val ch = T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, cast(ceil(size(tok) / 10.0) as int) - 1),
          |          i -> concat_ws(' ', slice(tok, i * 10 + 1, 10)))""".stripMargin))
        .as(Seq("idx", "chunk")))
    val boiler = ch.select("doc_id", "chunk").distinct()
      .groupBy("chunk").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 4)
      .select(col("chunk"), lit(1).as("bp"))
    ch.join(boiler, Seq("chunk"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_chunks"),
        sum(when(col("bp").isNotNull, 1).otherwise(0)).cast("int").as("n_removed"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN bp IS NULL THEN struct(idx, chunk) END)), x -> x.chunk)"),
          " ").as("clean_text"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Cross-document duplicated-passage detection (SPEC: Lee et al.
    * 2021, "Deduplicating Training Data Makes Language Models Better" —
    * exact substring dedup; this is the fixed-k window approximation of
    * their suffix-array pass, the form that distributes): every 8-token
    * window shared verbatim by ≥2 documents marks its positions
    * duplicated; per doc, report how much of it is duplicated text.
    * Shape: window grams with 8-byte xxhash64 keys (the oracle joins
    * the STRINGS, so hash semantics are cross-checked) → one two-phase
    * distinct-doc count per gram → one join back. Inverted-index-sized
    * intermediates, nothing quadratic — the same scaling argument as
    * text_ngram_novelty.
    */
  q("dedup_substring",
    """WITH tok AS (SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
      |     grams AS (
      |  SELECT doc_id, unnest([list_aggr(tok[i:i+7], 'string_agg', ' ')
      |                         FOR i IN range(1, greatest(len(tok) - 7, 1) + 1)]) AS g
      |  FROM tok),
      |     shared AS (SELECT g, 1 AS hit FROM grams
      |                GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
      |     per AS (SELECT gr.doc_id, count(*) AS n_windows, count(s.hit) AS n_dup
      |             FROM grams gr LEFT JOIN shared s ON gr.g = s.g
      |             GROUP BY gr.doc_id)
      |SELECT doc_id, n_windows, n_dup,
      |       round(CAST(n_dup AS DOUBLE) / n_windows, 6) AS dup_frac
      |FROM per ORDER BY doc_id""") { (s, d) =>
    val grams = T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, greatest(size(tok) - 8, 0)), i -> xxhash64(concat_ws(' ', slice(tok, i + 1, 8))))")).as("g"))
    val shared = grams.groupBy("g")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2)
      .select(col("g"), lit(1).as("hit"))
    grams.join(shared, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"), count(col("hit")).as("n_dup"))
      .select(col("doc_id"), col("n_windows"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_windows"), 6).as("dup_frac"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Shared deterministic keep-set selector for the sampling family
    * (mix_weighted / upsample / mix_temperature): 31/1000003-poly
    * content-hash bucket in [0, 1000). Membership depends only on
    * document CONTENT — stable under re-ingestion, repartitioning,
    * and incremental appends, which is why every sampling op here
    * prefers it to RNG state. ONE definition per engine: the
    * expression is bit-exactness-critical (both engines must produce
    * the identical bucket), so no op carries its own copy.
    */
  private def contentBucket: org.apache.spark.sql.Column = aggregate(
    graft.functions.text.tokenPolyHash(split(col("text"), " ")), lit(0L),
    (acc, h) => pmod(acc * lit(1000003L) + h, lit(1000000007L))) % 1000

  private val contentBucketSql =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(str_split(text, ' '), t ->
      |        list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(str_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
      |          (a, b) -> (a * 31 + b) % 1000000007))),
      |      (acc, h) -> (acc * 1000003 + h) % 1000000007) % 1000""".stripMargin

  /** Weighted domain mixing — build a training mix hitting TARGET
    * per-source proportions (upweight curated domains, downweight the
    * crawl), the step after filtering and before packing in every
    * corpus build. Shape: one tiny two-phase agg (rows = #domains)
    * computes per-source keep rates from the weight vector and a
    * global budget; rates then BROADCAST back onto the corpus and
    * selection is a map-side filter on a content-hash bucket — so
    * membership is deterministic under re-ingestion and reshuffling,
    * and the only data-sized work is one scan + one filter. At 100 TB
    * the rates table is O(#domains) (dozens) — never a shuffle.
    * `least(1.0, …)` caps oversampled domains at keep-all (no
    * upsampling-with-replacement here; that's a separate explode op).
    */
  q("pipeline_mix_weighted",
    s"""WITH w AS (
      |  SELECT source, count(*) AS n,
      |         CASE WHEN source IN ('src0', 'src1', 'src2') THEN 3.0
      |              WHEN source IN ('src3', 'src4') THEN 2.0
      |              ELSE 1.0 END AS w
      |  FROM documents GROUP BY source),
      |     r AS (
      |  SELECT source,
      |         least(1.0, w * 0.5 * (SELECT CAST(sum(n) AS DOUBLE) FROM w)
      |                    / ((SELECT sum(w) FROM w) * n)) AS rate
      |  FROM w),
      |     fp AS (
      |  SELECT doc_id, source,
      |    $contentBucketSql AS bucket
      |  FROM documents)
      |SELECT fp.doc_id, fp.source FROM fp JOIN r ON r.source = fp.source
      |WHERE fp.bucket < r.rate * 1000.0
      |ORDER BY fp.doc_id""") { (s, d) =>
    val docs = T(s, d, "documents")
    val wcol = when(col("source").isin("src0", "src1", "src2"), 3.0)
      .when(col("source").isin("src3", "src4"), 2.0).otherwise(1.0)
    val perSource = docs.groupBy("source")
      .agg(count(lit(1)).as("n")).withColumn("w", wcol)
    val totals = perSource.agg(
      sum("n").cast("double").as("n_total"), sum("w").as("w_total"))
    // rate_s = min(1, budget · w_s/Σw / n_s), budget = 50% of corpus;
    // FP expression order mirrors the oracle so doubles agree bit-wise
    val rates = perSource.crossJoin(broadcast(totals))
      .select(col("source"), least(lit(1.0),
        col("w") * lit(0.5) * col("n_total") / (col("w_total") * col("n")))
        .as("rate"))
    docs
      .withColumn("bucket", contentBucket)
      .join(broadcast(rates), Seq("source"))
      .filter(col("bucket") < col("rate") * 1000.0)
      .select("doc_id", "source")
      .orderBy("doc_id") // kept set is input-sized
  }

  /** Iterative proportional fitting / raking (Deming & Stephan 1940;
    * the survey-reweighting standard) of the (lang × source) training
    * mix toward UNIFORM marginals on both axes — the two-axis
    * generalization of the single-axis mix rows above: one axis can be
    * rebalanced by direct division, two coupled axes need IPF's
    * alternating row/col scaling. Two full iterations, unrolled (the
    * LPA/k-core fixed-round convention). Numeric frame: cells carry
    * q = fitted density RELATIVE TO UNIFORM (q = p·nL·nS, uniform
    * cell ⇒ q = 1), so magnitudes are catalog-bounded (≤ nL·nS) at ANY
    * corpus size — running IPF on raw counts would breach the 2³³ dy20
    * bound on a billion-doc corpus, and on raw probabilities the grid
    * would flush rare cells to 0 long before that. Every scaled cell
    * snaps to the dy20 grid BEFORE the next marginal sum (rule 12), so
    * the row/col sums are order-exact and the whole fit replays in SQL
    * as four chained window-scaling CTEs. Scale: ONE corpus-sized
    * two-phase agg; everything after lives on the |L|·|S| cell frame
    * (a 1000-executor cluster shuffles ~100 rows past the first agg).
    * Output per cell: rel-to-uniform density before/after + the boost
    * a sampler would apply (q/q₀ — the per-cell resampling rate that
    * achieves the balanced mix).
    */
  q("pipeline_balance_ipf",
    s"""WITH cells AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
      |     tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nd,
      |                    count(DISTINCT lang) AS nl,
      |                    count(DISTINCT source) AS ns FROM cells),
      |     t0 AS (SELECT lang, source, n, nl, ns,
      |                   ${Grid.dy20Sql("CAST(n AS DOUBLE) / nd * (nl * ns)")} AS q0
      |            FROM cells, tot),
      |     r1 AS (SELECT *, ${Grid.dy20Sql(
                      "q0 * (CAST(ns AS DOUBLE) / sum(q0) OVER (PARTITION BY lang))")} AS q1
      |            FROM t0),
      |     c1 AS (SELECT *, ${Grid.dy20Sql(
                      "q1 * (CAST(nl AS DOUBLE) / sum(q1) OVER (PARTITION BY source))")} AS q2
      |            FROM r1),
      |     r2 AS (SELECT *, ${Grid.dy20Sql(
                      "q2 * (CAST(ns AS DOUBLE) / sum(q2) OVER (PARTITION BY lang))")} AS q3
      |            FROM c1),
      |     c2 AS (SELECT *, ${Grid.dy20Sql(
                      "q3 * (CAST(nl AS DOUBLE) / sum(q3) OVER (PARTITION BY source))")} AS q4
      |            FROM r2)
      |SELECT lang, source, CAST(n AS BIGINT) AS n, round(q0, 6) AS rel0,
      |       round(q4, 6) AS rel, round(q4 / q0, 6) AS boost
      |FROM c2 ORDER BY lang, source""") { (s, d) =>
    val cells = T(s, d, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum("n").cast("double").as("nd"),
      countDistinct("lang").as("nl"), countDistinct("source").as("ns"))
    val wL = Window.partitionBy("lang")
    val wS = Window.partitionBy("source")
    cells.crossJoin(broadcast(tot)) // 1-row totals: genuinely bounded
      .withColumn("q0",
        Grid.dy20(col("n").cast("double") / col("nd") * (col("nl") * col("ns"))))
      .withColumn("q1",
        Grid.dy20(col("q0") * (col("ns").cast("double") / sum("q0").over(wL))))
      .withColumn("q2",
        Grid.dy20(col("q1") * (col("nl").cast("double") / sum("q1").over(wS))))
      .withColumn("q3",
        Grid.dy20(col("q2") * (col("ns").cast("double") / sum("q2").over(wL))))
      .withColumn("q4",
        Grid.dy20(col("q3") * (col("nl").cast("double") / sum("q3").over(wS))))
      .select(col("lang"), col("source"), col("n"), round(col("q0"), 6).as("rel0"),
        round(col("q4"), 6).as("rel"), round(col("q4") / col("q0"), 6).as("boost"))
      .reportSorted("lang", "source") // |L|·|S| cells = catalog-sized
  }

  /** Domain upsampling — the complement of [[pipeline_mix_weighted]]'s
    * cap: under-represented domains are REPLICATED toward a weighted
    * target (w_s × the largest domain's size), the epoch-style
    * oversampling every mix schedule needs. Integer part = whole-corpus
    * copies via a generator explode (`sequence(0, copies-1)` — no data
    * is rewritten, rows multiply at the generator); fractional part =
    * one extra copy for the deterministic content-hash slice, so the
    * realized factor converges to f_s without RNG state. Same
    * domains-sized agg + broadcast shape as the mix op: nothing
    * data-sized shuffles before the explode.
    */
  q("pipeline_upsample",
    s"""WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |     f AS (
      |  SELECT source,
      |         CASE WHEN source IN ('src0', 'src1', 'src2') THEN 2.5
      |              WHEN source IN ('src3', 'src4') THEN 1.5
      |              ELSE 1.0 END
      |           * (SELECT CAST(max(n) AS DOUBLE) FROM cnt) / n AS f
      |  FROM cnt),
      |     fp AS (
      |  SELECT doc_id, source,
      |    $contentBucketSql AS bucket
      |  FROM documents),
      |     c AS (
      |  SELECT fp.doc_id, fp.source,
      |         CAST(floor(f.f) AS BIGINT)
      |           + CASE WHEN fp.bucket < (f.f - floor(f.f)) * 1000.0 THEN 1 ELSE 0 END AS copies
      |  FROM fp JOIN f ON f.source = fp.source)
      |SELECT doc_id, source, unnest(range(0, copies)) AS copy FROM c
      |ORDER BY doc_id, copy""") { (s, d) =>
    val docs = T(s, d, "documents")
    val wcol = when(col("source").isin("src0", "src1", "src2"), 2.5)
      .when(col("source").isin("src3", "src4"), 1.5).otherwise(1.0)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val nmax = counts.agg(max("n").cast("double").as("n_max"))
    // f_s = w_s · n_max / n_s, FP order mirrors the oracle
    val factors = counts.crossJoin(broadcast(nmax))
      .select(col("source"), (wcol * col("n_max") / col("n")).as("f"))
    docs
      .withColumn("bucket", contentBucket)
      .join(broadcast(factors), Seq("source"))
      .withColumn("copies", floor(col("f")).cast("long") +
        when(col("bucket") < (col("f") - floor(col("f"))) * 1000.0, 1L).otherwise(0L))
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0L), col("copies") - 1)).as("copy"))
      .orderBy("doc_id", "copy") // replicated corpus = output-sized
  }

  /** Incremental dedup — dedup an ARRIVING batch against the standing
    * corpus (doc_id % 5 == 0 stands in for the new batch). This is the
    * production dedup shape at 100 TB: the corpus hash set is
    * maintained once (bucketed by hash prefix in practice) and each
    * ingest is (a) an in-batch hash-groupBy and (b) one anti-join
    * against it — never a full-corpus re-dedup. Both shuffles key on
    * the 32-byte sha2, so join width is independent of document size.
    * The oracle groups on the plaintext, so a hash-semantics bug
    * cannot pass.
    */
  q("dedup_incremental",
    """WITH c AS (SELECT DISTINCT lower(trim(text)) AS h FROM documents
      |           WHERE doc_id % 5 <> 0),
      |     b AS (SELECT lower(trim(text)) AS h, min(doc_id) AS doc_id
      |           FROM documents WHERE doc_id % 5 = 0 GROUP BY 1)
      |SELECT doc_id FROM b
      |WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.h = b.h)
      |ORDER BY doc_id""") { (s, d) =>
    val docs = T(s, d, "documents")
      .withColumn("h", sha2(lower(trim(col("text"))), 256))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).select("h").distinct()
    docs.filter(col("doc_id") % 5 === 0)
      .groupBy("h").agg(min("doc_id").as("doc_id"))  // in-batch dedup
      .join(corpus, Seq("h"), "left_anti")           // vs standing corpus
      .select("doc_id")
      .orderBy("doc_id") // one row per surviving batch doc = input-sized
  }

  /** Incremental NEAR-dup ingest — the fuzzy sibling of
    * [[dedup_incremental]] (which is exact-hash only): dedup an
    * arriving batch (doc_id % 5 == 0) against the standing corpus by
    * banded minhash. The corpus's band table is the PERSISTED INDEX a
    * production ingest maintains (bucketed by (band, sig) in
    * practice); each ingest is (a) batch signatures map-side, (b) ONE
    * equi-join batch-bands ⋈ corpus-bands — candidate volume ∝ bucket
    * collisions, never batch × corpus — and (c) exact Jaccard verify
    * on candidates only (the generate-cheap/verify-exact discipline).
    * Report per batch doc: candidate count, best corpus match
    * (max Jaccard, doc_id tie-break), and the keep decision at
    * τ = 0.5. Candidates sharing a band but no shingle score 0, not
    * null — they were real index probes.
    */
  q("dedup_incremental_minhash",
    s"""WITH $minhashCtesSql,
       |     jsh AS (SELECT DISTINCT doc_id, h FROM sh),
       |     cnt AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY doc_id),
       |     cand AS (
       |  SELECT DISTINCT nb.doc_id AS bd, cb.doc_id AS cd
       |  FROM bands nb JOIN bands cb ON cb.band = nb.band AND cb.sig = nb.sig
       |  WHERE nb.doc_id % 5 = 0 AND cb.doc_id % 5 <> 0),
       |     inter AS (
       |  SELECT c.bd, c.cd, count(*) AS i
       |  FROM cand c JOIN jsh x ON x.doc_id = c.bd
       |  JOIN jsh y ON y.doc_id = c.cd AND y.h = x.h
       |  GROUP BY c.bd, c.cd),
       |     scored AS (
       |  SELECT c.bd, c.cd,
       |         round(coalesce(i.i, 0) * 1.0
       |               / (na.n + nb2.n - coalesce(i.i, 0)), 6) AS j
       |  FROM cand c
       |  LEFT JOIN inter i ON i.bd = c.bd AND i.cd = c.cd
       |  JOIN cnt na ON na.doc_id = c.bd
       |  JOIN cnt nb2 ON nb2.doc_id = c.cd),
       |     nc AS (SELECT bd, CAST(count(*) AS BIGINT) AS n_candidates
       |            FROM cand GROUP BY bd),
       |     best AS (
       |  SELECT bd, cd, j FROM (
       |    SELECT bd, cd, j, row_number() OVER (PARTITION BY bd
       |             ORDER BY j DESC, cd) AS rn FROM scored) t
       |  WHERE rn = 1)
       |SELECT d.doc_id, coalesce(nc.n_candidates, 0) AS n_candidates,
       |       best.cd AS best_match, best.j AS best_jaccard,
       |       coalesce(best.j, 0) < 0.5 AS kept
       |FROM documents d
       |LEFT JOIN nc ON nc.bd = d.doc_id
       |LEFT JOIN best ON best.bd = d.doc_id
       |WHERE d.doc_id % 5 = 0
       |ORDER BY d.doc_id""") { (s, d) =>
    // spread measured net-positive HERE (2.15s -> ~1.45s): this key runs
    // the shingle pipeline for both the band table and the verify-side
    // jsh, so the parallelized narrow stage amortizes its exchange
    // (unlike the single-pass shingleHashes consumers — see the note
    // there). No-op at scale via the partition-count guard.
    val docs = T.spread(T(s, d, "documents"), col("doc_id"))
      .select("doc_id", "text")
    val bands = minhashBands(docs)
    val nb = bands.filter(col("doc_id") % 5 === 0)
      .select(col("band"), col("sig"), col("doc_id").as("bd"))
    val cb = bands.filter(col("doc_id") % 5 =!= 0)
      .select(col("band"), col("sig"), col("doc_id").as("cd"))
    val cand = nb.join(cb, Seq("band", "sig")).select("bd", "cd").distinct()
    val jsh = shingleHashes(docs)
      .select(col("doc_id"), explode(col("hs")).as("h")).distinct()
    val cnt = jsh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(jsh.as("x"), col("x.doc_id") === col("bd"))
      .join(jsh.as("y"), col("y.doc_id") === col("cd") && col("y.h") === col("x.h"))
      .groupBy("bd", "cd").agg(count(lit(1)).as("i"))
    val scored = cand.join(inter, Seq("bd", "cd"), "left")
      .join(cnt.select(col("doc_id").as("bd"), col("n").as("na")), Seq("bd"))
      .join(cnt.select(col("doc_id").as("cd"), col("n").as("nb2")), Seq("cd"))
      .select(col("bd"), col("cd"),
        round(coalesce(col("i"), lit(0L)) * lit(1.0) /
          (col("na") + col("nb2") - coalesce(col("i"), lit(0L))), 6).as("j"))
    val nCand = cand.groupBy("bd").agg(count(lit(1)).as("n_candidates"))
    val best = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("bd").orderBy(col("j").desc, col("cd").asc)))
      .filter(col("rn") === 1)
      .select(col("bd"), col("cd").as("best_match"), col("j").as("best_jaccard"))
    docs.filter(col("doc_id") % 5 === 0).select("doc_id")
      .join(nCand.withColumnRenamed("bd", "doc_id"), Seq("doc_id"), "left")
      .join(best.withColumnRenamed("bd", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).cast("long").as("n_candidates"),
        col("best_match"), col("best_jaccard"),
        (coalesce(col("best_jaccard"), lit(0.0)) < 0.5).as("kept"))
      .orderBy("doc_id") // one row per batch doc = input-sized
  }

  /** Record linkage / entity resolution — near-duplicate RECORDS (not
    * documents): candidate pairs via BLOCKING on (nation, name-prefix),
    * then exact edit distance inside each block. The classic two-stage
    * ER shape: the block join is an equi-join on a compact key whose
    * candidate volume ∝ block density (never |R|²), and the O(len²)
    * Levenshtein runs only on candidates — the same
    * generate-cheap/verify-exact discipline as the LSH text paths.
    * Both engines' levenshtein agree (unit-cost edit distance).
    */
  q("dedup_record_linkage",
    """SELECT a.c_custkey AS a, b.c_custkey AS b,
      |       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
      |FROM customer a JOIN customer b
      |  ON a.c_nationkey = b.c_nationkey
      | AND substring(a.c_name, 1, 15) = substring(b.c_name, 1, 15)
      | AND a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY a, b""") { (s, d) =>
    val c = T(s, d, "customer").select("c_custkey", "c_name", "c_nationkey")
      .withColumn("blk", concat(col("c_nationkey"), lit("_"),
        substring(col("c_name"), 1, 15)))
    val l = c.select(col("blk"), col("c_custkey").as("a"), col("c_name").as("na"))
    val r = c.select(col("blk"), col("c_custkey").as("b"), col("c_name").as("nb"))
    l.join(r, Seq("blk"))
      .filter(col("a") < col("b") && levenshtein(col("na"), col("nb")) <= 1)
      .select(col("a"), col("b"), levenshtein(col("na"), col("nb")).as("dist"))
      .orderBy("a", "b") // matched-pair set = input-sized
  }

  /** Per-document n-gram novelty — fraction of a doc's distinct
    * 3-shingles whose FIRST corpus occurrence (min doc_id) is this doc.
    * A standard curation signal: boilerplate-heavy and near-duplicate
    * docs score near 0, fresh content near 1. Shape: the distinct
    * (doc, shingle-hash) set → one groupBy per shingle for the first
    * owner (8-byte keys) → join back → per-doc conditional agg. At
    * 100 TB the first-owner table is the corpus's distinct-shingle set
    * — large but flat, the same table an inverted index would shuffle;
    * nothing is quadratic and no strings move after tokenization.
    */
  q("text_ngram_novelty",
    s"""WITH $shingleCtesSql,
       |     jsh AS (SELECT DISTINCT doc_id, h FROM sh),
       |     fst AS (SELECT h, min(doc_id) AS first_doc FROM jsh GROUP BY h)
       |SELECT j.doc_id, count(*) AS n_shingles,
       |       round(CAST(sum(CASE WHEN f.first_doc = j.doc_id THEN 1 ELSE 0 END)
       |             AS DOUBLE) / count(*), 6) AS novelty
       |FROM jsh j JOIN fst f ON f.h = j.h
       |GROUP BY j.doc_id ORDER BY j.doc_id""".stripMargin) { (s, d) =>
    val jsh = shingleHashes(T(s, d, "documents").select("doc_id", "text"))
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .distinct()
    val first = jsh.groupBy("h").agg(min("doc_id").as("first_doc"))
    jsh.join(first, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("nv"))
      .select(col("doc_id"), col("n_shingles"),
        round(col("nv").cast("double") / col("n_shingles"), 6).as("novelty"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Containment near-dup — asymmetric Jaccard |A∩B| / min(|A|,|B|)
    * over the SAME LSH candidate pairs as [[dedup_candidates_verified]]:
    * catches a short doc embedded in a longer one (quote farms, page
    * wrappers), which symmetric Jaccard under-scores. Documented
    * limitation, inherent to minhash-LSH: candidate recall tracks
    * symmetric Jaccard, so high-containment/low-Jaccard pairs need the
    * shorter doc's shingle count to be within LSH reach — the standard
    * trade; a dedicated containment index (e.g. a bottom-k sketch per
    * length class) is the escalation path if that misses too much.
    */
  q("dedup_containment",
    s"""WITH $minhashCtesSql,
       |     jsh AS (SELECT DISTINCT doc_id, h FROM sh),
       |     cnt AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY doc_id),
       |     inter AS (
       |  SELECT p.a, p.b, count(*) AS i FROM pairs p
       |  JOIN jsh x ON x.doc_id = p.a
       |  JOIN jsh y ON y.doc_id = p.b AND y.h = x.h
       |  GROUP BY p.a, p.b)
       |SELECT i.a, i.b,
       |       round(i.i * 1.0 / least(na.n, nb.n), 6) AS containment
       |FROM inter i JOIN cnt na ON na.doc_id = i.a JOIN cnt nb ON nb.doc_id = i.b
       |WHERE i.i * 1.0 / least(na.n, nb.n) >= 0.9
       |ORDER BY a, b""".stripMargin) { (s, d) =>
    val docs = T(s, d, "documents").select("doc_id", "text")
    val cand = minhashPairsOf(docs)
    val jsh = shingleHashes(docs)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .distinct()
    val counts = jsh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(jsh.select(col("doc_id").as("a"), col("h")), Seq("a"))
      .join(jsh.select(col("doc_id").as("b"), col("h")), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    inter
      .join(counts.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(counts.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("containment",
        round(col("i") * lit(1.0) / least(col("na"), col("nb")), 6))
      .filter(col("i") * lit(1.0) / least(col("na"), col("nb")) >= 0.9)
      .select("a", "b", "containment")
      .orderBy("a", "b") // candidate-pair-sized
  }

  /** Quality-filter funnel — classify every document by its FIRST
    * failing filter (length floor/ceiling, stopword-density floor) and
    * report the kept/dropped counts per reason: the per-stage loss
    * report every corpus-cleaning run ships with. Pure map-side
    * classify + one count shuffle on a ~4-value key; output is bounded
    * by the reason cardinality.
    */
  q("pipeline_quality_filter",
    """SELECT reason, count(*) AS n FROM (
      |  SELECT CASE
      |    WHEN n_chars < 200 THEN 'too_short'
      |    WHEN n_chars > 380 THEN 'too_long'
      |    WHEN CAST(len(list_filter(str_split(text, ' '),
      |           t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
      |         / greatest(len(str_split(text, ' ')), 1) < 0.03 THEN 'low_stopword'
      |    ELSE 'keep' END AS reason
      |  FROM documents) t
      |GROUP BY reason ORDER BY reason""") { (s, d) =>
    val toks = split(col("text"), " ")
    val stopRatio =
      size(filter(toks, t => t.isin("the", "a", "and", "of", "to"))).cast("double") /
        greatest(size(toks), lit(1))
    T(s, d, "documents")
      .select(when(col("n_chars") < 200, "too_short")
        .when(col("n_chars") > 380, "too_long")
        .when(stopRatio < 0.03, "low_stopword")
        .otherwise("keep").as("reason"))
      .groupBy("reason").agg(count(lit(1)).as("n"))
      .reportSorted("reason")
  }

  // -------------------------------------------------------- multimodal

  q("multimodal_join",
    """SELECT d.doc_id, d.lang, CAST(len(e.embedding) AS INTEGER) AS dim,
      |       round(CAST(e.embedding[1] AS DOUBLE), 6) AS e0
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |WHERE d.lang = 'en' ORDER BY d.doc_id""") { (s, d) =>
    T(s, d, "documents")
      .filter(col("lang") === "en")
      .join(T(s, d, "embeddings"), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** PageRank with dangling-mass redistribution — the iterative graph
    * primitive beyond connectedComponents' label propagation: rank_v =
    * (1−d) + d·(Σ_in rank_u/outdeg_u + danglingMass/N). Per iteration
    * ONE join (ranks onto edges, co-partitioned on the vertex key) and
    * ONE (dst) aggregate — the classic two-shuffle round, state is one
    * double per vertex; per-round localCheckpoint caps lineage like
    * CC. Vertices without candidates (no edges) stay in the frame via
    * the full-outer fold and donate their mass as dangling. Driver
    * state: ONE double (the dangling sum) per round — the bounded
    * class.
    *
    * Determinism device: each round's dangling mass and every new rank
    * are quantized to the 1e-6 grid via `floor(x·1e6 + 0.5000005)/1e6`,
    * making the iteration a QUANTIZED fixpoint any engine replays
    * bit-identically. Two deliberate choices: (a) pure IEEE floor
    * arithmetic, NOT `round()` — library round semantics differ on
    * half-cases (Spark's exact BigDecimal expansion vs multiply-based
    * rounding), and a quantized recurrence generates half-cases
    * systematically (1e-6-multiple ranks over small degrees); (b) the
    * ε = 5e-7 boundary shift moves the decision line off the
    * systematic accumulation points (exact multiples of the half
    * grid), so partition-order summation noise (~1e-9) can never
    * straddle it — verified by hash-equality against the unrolled SQL
    * replay at sf0.01 AND sf0.1. Cost: mass conservation holds to
    * N·iters·5e-7 instead of machine precision — semantically free at
    * rank scale, and what upgrades graph_pagerank from rows-only to a
    * full hash check.
    *
    * RESIDUAL RISK (applies to every ε-shifted quantization site in
    * this file): the device is exact for values that are sums of grid
    * multiples; for non-grid quantities (rank/degree contributions,
    * covariance entries, λ·rel scores) cross-engine bit-equality is
    * probabilistic — a true value can land inside the ~1e-9
    * engine-noise band around the SHIFTED boundary, ~1e-9/1e-6 ≈ 1e-3
    * odds per site scaled by band/grid ≈ 1e-9 per coordinate per
    * round in practice. The verified-at-two-SFs claim bounds observed
    * behavior, not the tail. If a future round reds one of these keys
    * on new data with no code change: RE-VERIFY (rerun the pair and
    * diff the handful of straddled coordinates) before bisecting —
    * a rare boundary straddle is expected behavior, not a logic bug.
    */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    // localCheckpoint blocks outlive Dataset.unpersist (it only clears
    // CacheManager entries) — track persistent-RDD ids and free each
    // round's blocks once the next checkpoint exists, exactly the
    // connectedComponents discipline above. Only the final ranks
    // blocks survive; the harness clears those via releaseCheckpoints.
    val sc = vertices.sparkSession.sparkContext
    def persisted: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def free(ids: Set[Int]): Unit = ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val n = vertices.count()
    val pre0 = persisted
    // checkpoint the EDGE FRAME first: everything per-round derives
    // from it, so an uncheckpointed edge lineage (e.g. a whole kNN
    // build) would re-execute every iteration. Edges are restricted to
    // the vertex frame on BOTH endpoints — an out-of-set dst would
    // silently lose its contribution and break the mass-conservation
    // contract the spec pins.
    val e = edges
      .join(vertices.select(col("vid").as("src")), Seq("src"), "left_semi")
      .join(vertices.select(col("vid").as("dst")), Seq("dst"), "left_semi")
      .localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    // (src, dst, deg) resolved once — re-used every round
    val withDeg = e.join(outdeg, Seq("src")).localCheckpoint()
    // dangling mass rides each round's checkpoint as an Observation
    // metric (r18, guide §2.4/§1.5): the old per-round
    // crossJoin(broadcast(semi-join + agg)) paid a broadcast-build job
    // and re-read the ranks checkpoint; now the dangling flag is a
    // column of the vertex base frame, the raw mass comes back as a
    // driver scalar from the round's own materialization, and the next
    // round embeds the floor-quantized value as a literal. Identical
    // arithmetic: same shuffled double sum (the ε-shifted 1e-6 grid
    // absorbs partition-order ulps exactly as before),
    // java.lang.Math.floor == Catalyst floor on doubles.
    val vbase = vertices
      .join(vertices.join(outdeg, col("vid") === col("src"), "left_anti")
        .select(col("vid"), lit(true).as("dang")), Seq("vid"), "left")
      .select(col("vid"), coalesce(col("dang"), lit(false)).as("dang"))
      .localCheckpoint()
    val fixedIds = persisted -- pre0
    def quantized(raw: Any): Double =
      math.floor((raw match {
        case null => 0.0
        case d: java.lang.Double => d.doubleValue()
      }) * 1e6 + 0.5000005) / 1e6
    val preRanks = persisted
    val obs0 = org.apache.spark.sql.Observation()
    var ranks = vbase.select(col("vid"), col("dang"), lit(1.0).as("rank"))
      .observe(obs0, sum(when(col("dang"), col("rank"))).as("dm"))
      .localCheckpoint()
    var ranksIds = persisted -- preRanks
    var dmass = quantized(obs0.get("dm"))
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.select("vid", "rank"), col("src") === col("vid"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      val prevIds = ranksIds
      val pre = persisted
      val obs = org.apache.spark.sql.Observation()
      ranks = vbase
        .join(contribs, col("vid") === col("dst"), "left")
        .select(col("vid"), col("dang"),
          (floor((lit(1 - damping) +
            lit(damping) * (coalesce(col("in_sum"), lit(0.0)) + lit(dmass) / n))
            * 1e6 + lit(0.5000005)) / 1e6).as("rank"))
        .observe(obs, sum(when(col("dang"), col("rank"))).as("dm"))
        .localCheckpoint()
      ranksIds = persisted -- pre
      dmass = quantized(obs.get("dm"))
      free(prevIds) // the new checkpoint carries all still-needed state
    }
    free(fixedIds) // edge/degree/dangling frames are dead once ranks exist
    ranks.select("vid", "rank")
  }

  /** The kNN graph's PageRank — vectors central to many neighborhoods
    * rank high, isolated ones sit at the (1−d) floor: the
    * representativeness signal graph-based corpus selection uses
    * (select high-rank docs for coverage, prune the floor as
    * outliers). Edges are the same multi-table-LSH kNN build as
    * `sim_knn_graph` (rank ≤ 3 per vertex). HASH-CHECKED since
    * round 10: [[pageRank]]'s per-round 6dp quantization makes the
    * recurrence engine-replayable, so the oracle UNROLLS all 5
    * iterations as chained CTEs over the shared kNN-edge SQL —
    * constants go through `CAST(0.85 AS DOUBLE)` so DuckDB's decimal
    * literals can't diverge from Scala's double arithmetic. The
    * analytic invariants (quantized mass conservation, the (1−d)
    * floor, in-degree monotonicity) stay pinned in OpsSemanticsSpec.
    */
  q("graph_pagerank", {
    val (bucketCols, unions) = multiLshCandCtes(6, 6)
    val iters = 5
    val head =
      s"""WITH bk AS (SELECT vec_id, embedding,
         |       $bucketCols FROM embeddings),
         |     cand AS (
         |  $unions),
         |     scored AS (
         |  SELECT c.a, c.b,
         |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
         |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cos
         |  FROM cand c
         |  JOIN embeddings ea ON ea.vec_id = c.a
         |  JOIN embeddings eb ON eb.vec_id = c.b),
         |     ed AS (SELECT a AS qid, b AS nbr, cos FROM scored
         |            UNION ALL SELECT b, a, cos FROM scored),
         |     rk AS (SELECT qid, nbr, row_number() OVER (
         |              PARTITION BY qid ORDER BY cos DESC, nbr) AS rank
         |            FROM ed),
         |     e AS (SELECT qid AS src, nbr AS dst FROM rk WHERE rank <= 3),
         |     verts AS (SELECT vec_id AS vid FROM embeddings),
         |     deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |     nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
         |     r0 AS (SELECT vid, CAST(1.0 AS DOUBLE) AS rank FROM verts)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s""",
         |     d$k AS (SELECT floor(coalesce(sum(r.rank), 0) * 1000000 + CAST(0.5000005 AS DOUBLE)) / 1000000 AS dmass
         |             FROM r${k - 1} r LEFT JOIN deg ON r.vid = deg.src
         |             WHERE deg.src IS NULL),
         |     c$k AS (SELECT e.dst, sum(r.rank / deg.deg) AS in_sum
         |             FROM e JOIN deg ON e.src = deg.src
         |             JOIN r${k - 1} r ON r.vid = e.src
         |             GROUP BY e.dst),
         |     r$k AS (SELECT v.vid,
         |                    floor(((1 - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) *
         |                           (coalesce(c$k.in_sum, 0) + d$k.dmass / nn.n))
         |                          * 1000000 + CAST(0.5000005 AS DOUBLE)) / 1000000 AS rank
         |             FROM verts v LEFT JOIN c$k ON c$k.dst = v.vid, d$k, nn)""".stripMargin
    }.mkString
    head + rounds +
      s"\nSELECT vid AS vec_id, rank AS pagerank FROM r$iters ORDER BY vec_id"
  }) { (s, d) =>
    val emb = T(s, d, "embeddings").select("vec_id", "embedding")
    val edges = knnEdges(emb).select(col("qid").as("src"), col("nbr").as("dst"))
    val ranks = pageRank(emb.select(col("vec_id").as("vid")), edges, iters = 5)
    // the returned frame rides the final localCheckpoint; the harness
    // releases it after consumption (Sessions.releaseCheckpoints)
    ranks
      .select(col("vid").as("vec_id"), col("rank").as("pagerank"))
      .orderBy("vec_id")
  }

  /** Length-bucketed batch formation — the dynamic-batching prep that
    * minimizes padding waste (train-time tokens ∝ batch · max-len, so
    * batching a 20-token doc with a 500-token doc wastes 96% of the
    * short rows): docs group into 32-token length buckets, fixed
    * batches of 16 form WITHIN each bucket in deterministic
    * (n_tok, doc_id) order, and the report shows each batch's padding
    * waste — bounded ≤ 31·16 tokens by construction (vs unbounded for
    * random batching). The complement of pipeline_pack_sequences:
    * packing concatenates docs into fixed windows, this batches
    * same-length docs unconcatenated. ONE bucket-partitioned sort
    * serves the rank; batch stats are a two-phase aggregate over the
    * (bucket, batch) grid.
    */
  q("pipeline_length_bucket_batching",
    """WITH t AS (
      |  SELECT doc_id, len(str_split(text, ' ')) AS n_tok,
      |         CAST(len(str_split(text, ' ')) // 32 AS INTEGER) AS bucket
      |  FROM documents),
      |     r AS (
      |  SELECT doc_id, n_tok, bucket,
      |         CAST((row_number() OVER (PARTITION BY bucket
      |                ORDER BY n_tok, doc_id) - 1) // 16 AS INTEGER) AS batch_id
      |  FROM t)
      |SELECT bucket, batch_id, count(*) AS n_docs,
      |       CAST(max(n_tok) AS BIGINT) AS max_tok,
      |       CAST(max(n_tok) * count(*) - sum(n_tok) AS BIGINT) AS padding_waste
      |FROM r GROUP BY 1, 2 ORDER BY bucket, batch_id""") { (s, d) =>
    val w = Window.partitionBy("bucket").orderBy(col("n_tok").asc, col("doc_id").asc)
    T(s, d, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
      .withColumn("bucket", (col("n_tok") / 32).cast("int"))
      .withColumn("batch_id", ((row_number().over(w) - 1) / 16).cast("int"))
      .groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max("n_tok").cast("long").as("max_tok"),
        (max("n_tok") * count(lit(1)) - sum("n_tok")).cast("long").as("padding_waste"))
      .orderBy("bucket", "batch_id") // batch-count-sized output
  }

  /** Compression-ratio quality signal (the Gopher/RefinedWeb family's
    * repetition proxy: highly compressible text is boilerplate/
    * templated, incompressible text is diverse or junk — both tails
    * get filtered): deflated bytes / raw bytes per doc via
    * `java.util.zip.Deflater` (BEST_SPEED — the signal needs ordering,
    * not optimal encoding). mapPartitions is the correct slot — this
    * is byte-codec work like the multimodal decode path, one Deflater
    * reused per partition, zero shuffle before the output sort.
    *
    * Gate (r18 — closes the registry's last `no_oracle` row): DuckDB
    * cannot re-derive zlib output, so the oracle is DATA-PARAMETERIZED
    * (the qDyn/BPE discipline): Verify-time gen deflates every doc
    * through an INDEPENDENT single-shot code path (fresh Deflater per
    * doc, one pre-sized buffer — not the partition-reused incremental
    * loop the operator runs) and embeds the per-doc compressed length
    * as a VALUES artifact; DuckDB then independently recomputes the
    * raw UTF-8 byte length (strlen), the ratio division, and the
    * 6-dp half-even rounding (round_even ≡ math.rint — verified on
    * the comp·2e6 ≡ raw·odd boundary where plain round() diverges),
    * LEFT-joined from documents so a missing/extra doc reds the hash
    * rather than vanishing. The monotonicity contract (repetitive ≪
    * diverse) stays pinned in OpsSemanticsSpec; determinism of the
    * container zlib across the two code paths is what the artifact
    * trusts (same libz.so in one JVM — and a partition-reuse bug like
    * a missed reset() now reds the gate instead of hiding).
    */
  qDyn("text_compression_ratio") { (s, d) =>
    import s.implicits._
    T(s, d, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
        // release the native zlib workspace on task COMPLETION, not
        // iterator drain: an early-terminated task (limit/take,
        // failure/retry) never exhausts the iterator, and GC never
        // feels the off-heap allocation, so native RSS would
        // accumulate across a long bench session
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => deflater.end())
        val buf = new Array[Byte](1 << 16)
        val out = it.map { case (id, text) =>
          // null-tolerant like every sibling text operator
          val raw = if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          (id, raw.length.toLong,
            if (raw.length == 0) 1.0
            else math.rint(compressed.toDouble / raw.length * 1e6) / 1e6)
        }
        if (tc != null) out
        else new Iterator[(Long, Long, Double)] { // driver-local fallback
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) deflater.end()
            h
          }
          def next(): (Long, Long, Double) = out.next()
        }
      }
      .toDF("doc_id", "n_bytes", "deflate_ratio")
      .orderBy("doc_id") // one row per doc = input-sized
  } { (s, d) =>
    import s.implicits._
    // independent single-shot deflate per doc (fresh instance, sized
    // buffer) — deliberately NOT the operator's reused-Deflater loop
    val art = T(s, d, "documents").select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, text) =>
        val raw = if (text == null) Array.emptyByteArray
          else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val df8 = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
        try {
          df8.setInput(raw)
          df8.finish()
          val buf = new Array[Byte](raw.length + 1024)
          var n = 0L
          while (!df8.finished()) n += df8.deflate(buf)
          s"($id,$n)"
        } finally df8.end()
      }
    s"""WITH art(doc_id, comp) AS (VALUES ${art.mkString(",")})
       |SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS n_bytes,
       |  CASE WHEN strlen(d.text) = 0 THEN CAST(1.0 AS DOUBLE)
       |       ELSE round_even(a.comp / CAST(strlen(d.text) AS DOUBLE), 6)
       |  END AS deflate_ratio
       |FROM documents d LEFT JOIN art a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** BM25 ranking (Robertson et al.; the Lucene-default scoring) — the
    * sparse-retrieval baseline every RAG stack pairs with dense ANN:
    * score(q,d) = Σ_w idf(w) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
    * k1=1.2, b=0.75, idf = ln(1+(N−df+0.5)/(df+0.5)). Shape: the
    * token stream filters to the 3 query terms MAP-SIDE (the shuffle
    * carries only matching (doc, term) rows — query-sized, not
    * corpus-sized), df/N/avgdl are broadcast-tiny aggregates, and the
    * final top-10 ranks on the 6-dp-rounded score so cross-engine ln
    * ulps can't flip ranks (the tfidf discipline). At open-web scale
    * an inverted-index table replaces the filter, same join shape.
    */
  /** The BM25 CTE chain (dl/stats/tf/df/scored) shared VERBATIM by the
    * text_bm25_topk and sim_hybrid_rrf oracles — one definition, so a
    * formula fix can't desynchronize the two from the single shared
    * Spark implementation (bm25Scores).
    */
  private val bm25OracleCtes: String =
    """dl AS (SELECT doc_id, len(str_split(text, ' ')) AS dl FROM documents),
      |     stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
      |     tf AS (SELECT doc_id, w, count(*) AS tf FROM (
      |              SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
      |            WHERE w IN ('spark', 'query', 'merge') GROUP BY 1, 2),
      |     df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      |     scored AS (
      |  SELECT tf.doc_id,
      |         round(sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
      |           tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))), 6) AS score
      |  FROM tf JOIN df ON df.w = tf.w
      |          JOIN dl ON dl.doc_id = tf.doc_id
      |          CROSS JOIN stats
      |  GROUP BY tf.doc_id)""".stripMargin

  q("text_bm25_topk",
    s"""WITH $bm25OracleCtes
      |SELECT doc_id, score,
      |       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank
      |FROM scored ORDER BY rank LIMIT 10""") { (s, d) =>
    // orderBy+limit plans TakeOrderedAndProject (distributed top-k) —
    // the rank window then runs over 10 rows, never the scored set
    val top = bm25Scores(s, d).orderBy(col("score").desc, col("doc_id").asc).limit(10)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("int"))
      .reportSorted("rank")
  }

  /** Per-doc BM25 scores for the fixed 3-term probe query (shared by
    * text_bm25_topk and the RRF fusion). Scored-doc output is
    * query-sized; the single-partition rank in the consumers is the
    * REPORT-sort case (top-k of a query-matched set, not the corpus).
    */
  private def bm25Scores(s: SparkSession, d: String): DataFrame = {
    val docs = T(s, d, "documents")
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w").isin("spark", "query", "merge"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(
        log(lit(1) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))), 6)
        .as("score"))
  }

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009
    * — the standard RAG serving composition): fuse the SPARSE BM25
    * list with the DENSE cosine list as Σ 1/(60 + rank), which needs
    * no score calibration between the two systems because only RANKS
    * cross the boundary — integer ranks fuse deterministically where
    * raw-score mixing would be ulp-fragile. Both lists are top-20 of
    * query-sized candidate sets; the fusion is a union + one tiny
    * group-sum. Docs align with vectors by id (the multimodal_join
    * contract).
    */
  q("sim_hybrid_rrf",
    s"""WITH $bm25OracleCtes,
      |     sparse AS (
      |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
      |  FROM scored
      |  QUALIFY rnk <= 20),
      |     dense AS (
      |  SELECT e.vec_id AS doc_id,
      |         CAST(row_number() OVER (ORDER BY round(list_cosine_similarity(
      |           CAST(e.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[])), 6) DESC,
      |           e.vec_id) AS INTEGER) AS rnk
      |  FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) p
      |  WHERE e.vec_id <> 0
      |  QUALIFY rnk <= 20),
      |     fused AS (
      |  SELECT doc_id, round(sum(CAST(1.0 AS DOUBLE) / (60 + rnk)), 6) AS rrf, count(*) AS n_lists
      |  FROM (SELECT * FROM sparse UNION ALL SELECT * FROM dense)
      |  GROUP BY doc_id)
      |SELECT doc_id, rrf, CAST(n_lists AS INTEGER) AS n_lists,
      |       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank
      |FROM fused ORDER BY rank LIMIT 10""") { (s, d) =>
    // both top-20 lists via TakeOrderedAndProject (distributed top-k);
    // the rank windows then see 20 rows each, never the corpus
    val sparse = bm25Scores(s, d)
      .orderBy(col("score").desc, col("doc_id").asc).limit(20)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("int"))
      .select("doc_id", "rnk")
    val emb = T(s, d, "embeddings")
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
    val dense = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        round(graft.functions.vec.cosine(col("embedding"), col("qemb")), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc).limit(20)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("int"))
      .select("doc_id", "rnk")
    sparse.unionByName(dense)
      .groupBy("doc_id")
      .agg(round(sum(lit(1.0) / (lit(60) + col("rnk"))), 6).as("rrf"),
        count(lit(1)).cast("int").as("n_lists"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("int"))
      .filter(col("rank") <= 10)
      .reportSorted("rank")
  }

  /** Embedding pooling — mean-pool a group of chunk/token vectors
    * into one representative vector (the chunk→document embedding
    * step every RAG/retrieval index build runs; label groups stand in
    * for a doc's chunks). Shape: posexplode to (group, dim_pos,
    * component) — the shuffle key is compact and the row count is
    * |vectors|·dim, map-side combinable — one two-phase avg per
    * (group, pos), then an in-row sorted reassembly per group. No
    * collect, no driver state; dim is a per-row constant so the
    * explode factor is fixed. Components round at 6 BEFORE reassembly
    * so the array hash is ulp-stable.
    */
  q("sim_vector_pool_mean",
    """WITH c AS (
      |  SELECT label,
      |         unnest(generate_series(1, len(embedding))) - 1 AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |     m AS (SELECT label, pos, round(avg(x), 6) AS mx
      |           FROM c GROUP BY 1, 2)
      |SELECT label, CAST(count(*) AS INTEGER) AS dim,
      |       string_agg(CAST(CAST(mx AS DECIMAL(18,6)) AS VARCHAR), ','
      |                  ORDER BY pos) AS pooled
      |FROM m GROUP BY label ORDER BY label""") { (s, d) =>
    T(s, d, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(round(avg(col("x").cast("double")), 6).as("mx"))
      .groupBy("label")
      .agg(count(lit(1)).cast("int").as("dim"),
        // Serialize the pooled vector for the report: a fixed-scale
        // DECIMAL(18,6) render is byte-identical across Spark and
        // DuckDB (both print all six scale digits), where raw
        // double→string differs (1.0E-7 vs 1e-07) and raw arrays
        // crash the harness's pandas row sorter (checklist item 10).
        // Downstream consumers keep the array form internal.
        expr("""array_join(transform(
                  array_sort(collect_list(struct(pos, mx))),
                  e -> cast(cast(e.mx as decimal(18,6)) as string)), ',')""")
          .as("pooled"))
      .reportSorted("label")
  }

  /** Token-budget sampling — "take the best N tokens per source", the
    * pretraining mixture step that caps each domain's contribution:
    * docs rank by quality (length here) within source, accumulate
    * token counts in rank order, and the corpus keeps every doc whose
    * RUNNING total fits the budget. ONE source-partitioned sort
    * serves both the rank and the cumulative sum (same growing-frame
    * window); output ∝ kept docs. The greedy prefix rule (first doc
    * over the line is dropped, scan continues conceptually but ranks
    * are monotone so the prefix IS the answer) keeps selection
    * deterministic and restart-stable — no RNG state, same property
    * as pipeline_epoch_shuffle's hash keys.
    */
  q("pipeline_token_budget",
    """WITH t AS (
      |  SELECT doc_id, source, len(str_split(text, ' ')) AS n_tok
      |  FROM documents),
      |     r AS (
      |  SELECT doc_id, source, n_tok,
      |         CAST(sum(n_tok) OVER (PARTITION BY source
      |           ORDER BY n_tok DESC, doc_id
      |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM t)
      |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok, cum
      |FROM r WHERE cum <= 4000 ORDER BY source, cum""") { (s, d) =>
    val w = Window.partitionBy("source")
      .orderBy(col("n_tok").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T(s, d, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") <= 4000)
      .select(col("doc_id"), col("source"), col("n_tok").cast("long").as("n_tok"),
        col("cum"))
      .orderBy("source", "cum") // kept-docs-sized output
  }

  /** Leakage-resistant train/val/test split: the fold key is a hash of
    * the CONTENT (md5 of text), not the row id, so byte-identical
    * duplicates always land in the same fold — the id-hash split's
    * classic eval-contamination hole (a dup pair straddling
    * train/test leaks the answer). Near-dup-safe splitting composes
    * the same way: hash dedup_cluster_canonical's cluster id instead.
    * Pure map-side — no shuffle, no RNG (restart-stable, and any
    * engine recomputes the identical assignment); the fold index is
    * two hex nibbles of the digest modulo 10, identically expressible
    * in both engines.
    */
  q("pipeline_train_test_split",
    """WITH t AS (SELECT doc_id, md5(text) AS h FROM documents),
      |f AS (SELECT doc_id,
      |        ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
      |         strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 10 AS fold FROM t)
      |SELECT doc_id, CAST(fold AS BIGINT) AS fold,
      |  CASE WHEN fold <= 7 THEN 'train' WHEN fold = 8 THEN 'val' ELSE 'test' END AS split
      |FROM f ORDER BY doc_id""") { (s, d) =>
    T(s, d, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("fold",
        ((expr("instr('0123456789abcdef', substring(h, 1, 1))") - 1) * 16 +
          expr("instr('0123456789abcdef', substring(h, 2, 1))") - 1) % 10)
      .select(col("doc_id"), col("fold").cast("long").as("fold"),
        when(col("fold") <= 7, "train").when(col("fold") === 8, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** CDC snapshot upsert — the Delta-style MERGE applied relationally:
    * a change stream (here: the later half of events, latest change
    * per key winning, `error` = tombstone/delete) folds into a base
    * snapshot (latest state from the earlier half). Shape: both sides
    * reduce to one row per key with a window over the SAME user_id
    * partitioning, then ONE full-outer equi-join on that key — the
    * exchange-reuse case, Spark aligns both children on user_id so the
    * join adds no third shuffle. Deletes drop, updates win over
    * snapshot rows, untouched snapshot keys pass through. The split
    * point is data-derived (midpoint of the time range, exact integer
    * micros) so the query is scale-factor-agnostic; production wires a
    * watermark/batch-id instead. Streaming twin: stream_stateful_custom
    * carries exactly this latest-wins keyed state.
    */
  q("pipeline_snapshot_upsert",
    """WITH x AS (SELECT user_id, event_id, event_type, value,
      |                  CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
      |     c AS (SELECT min(us) + (max(us) - min(us)) // 2 AS cut FROM x),
      |     snap AS (SELECT user_id, value, us FROM (
      |        SELECT x.*, row_number() OVER (PARTITION BY user_id
      |                      ORDER BY us DESC, event_id DESC) AS rn
      |        FROM x, c WHERE us < cut) t WHERE rn = 1),
      |     delta AS (SELECT user_id, value, us,
      |                      CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      |               FROM (
      |        SELECT x.*, row_number() OVER (PARTITION BY user_id
      |                      ORDER BY us DESC, event_id DESC) AS rn
      |        FROM x, c WHERE us >= cut) t WHERE rn = 1)
      |SELECT coalesce(d.user_id, s.user_id) AS user_id,
      |       round(CASE WHEN d.user_id IS NOT NULL THEN d.value ELSE s.value END, 6) AS val,
      |       CASE WHEN d.user_id IS NOT NULL THEN 'delta' ELSE 'snap' END AS src,
      |       CASE WHEN d.user_id IS NOT NULL THEN d.us ELSE s.us END AS last_us
      |FROM snap s FULL OUTER JOIN delta d ON d.user_id = s.user_id
      |WHERE d.user_id IS NULL OR d.op = 'U'
      |ORDER BY user_id""") { (s, d) =>
    val x = T(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us"))
    // integer `div` keeps the midpoint exact at any timestamp unit —
    // epoch µs still fit double's 2^53 range, the ns source unit doesn't
    val cut = x.agg(expr("min(us) + (max(us) - min(us)) div 2").as("cut"))
    val w = Window.partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
    def latest(side: DataFrame): DataFrame =
      side.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val withCut = x.crossJoin(broadcast(cut))
    val snap = latest(withCut.filter(col("us") < col("cut")))
      .select(col("user_id").as("s_uid"), col("value").as("s_val"), col("us").as("s_us"))
    val delta = latest(withCut.filter(col("us") >= col("cut")))
      .select(col("user_id").as("d_uid"), col("value").as("d_val"), col("us").as("d_us"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"))
    snap.join(delta, col("s_uid") === col("d_uid"), "full_outer")
      .filter(col("d_uid").isNull || col("op") === "U")
      .select(coalesce(col("d_uid"), col("s_uid")).as("user_id"),
        round(when(col("d_uid").isNotNull, col("d_val")).otherwise(col("s_val")), 6).as("val"),
        when(col("d_uid").isNotNull, "delta").otherwise("snap").as("src"),
        when(col("d_uid").isNotNull, col("d_us")).otherwise(col("s_us")).as("last_us"))
      .orderBy("user_id") // one row per live key = input-sized
  }

  /** Document chunking — the RAG/pretraining segmentation pass: fixed
    * 32-token windows at stride 24 (8-token overlap so no boundary
    * context is lost), chunk k of a doc = tokens [24k, 24k+32). Pure
    * map-side: tokenize once, explode the stride grid per doc
    * (generated data, no scan amplification), slice the token array —
    * zero shuffles before the output sort; chunk count ∝ corpus tokens
    * so the output keeps the distributed orderBy. The whitespace
    * tokenizer is the pluggable slot (a BPE vocab drops into the same
    * shape); chunk_id is dense so downstream packing/embedding keys on
    * (doc_id, chunk_id).
    */
  q("pipeline_chunk_documents",
    """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks,
      |                  len(str_split(text, ' ')) AS n FROM documents),
      |     g AS (SELECT doc_id, toks, n,
      |                  unnest(generate_series(0, n - 1, 24)) AS st FROM t)
      |SELECT doc_id, CAST(st // 24 AS INTEGER) AS chunk_id,
      |       CAST(len(list_slice(toks, st + 1, least(st + 32, n))) AS INTEGER) AS n_tok,
      |       array_to_string(list_slice(toks, st + 1, least(st + 32, n)), ' ') AS chunk
      |FROM g ORDER BY doc_id, chunk_id""") { (s, d) =>
    T(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("st", explode(sequence(lit(0), col("n") - 1, lit(24))))
      .select(col("doc_id"), (col("st") / 24).cast("int").as("chunk_id"),
        size(slice(col("toks"), col("st") + 1, lit(32))).as("n_tok"),
        array_join(slice(col("toks"), col("st") + 1, lit(32)), " ").as("chunk"))
      .orderBy("doc_id", "chunk_id") // chunk per 24 input tokens = input-sized
  }

  /** Late-interaction retrieval (ColBERT MaxSim, Khattab & Zaharia
    * 2020): a multi-vector query scores a multi-vector document as
    * Σ_q max_d cos(q, d) — token-level matching that bag-of-vector
    * single-cosine retrieval can't express. Here the query is 8 token
    * vectors (vec_id < 8) and each label group plays a multi-vector
    * doc. Shape: the tiny query set broadcasts onto ONE embeddings
    * pass (8 codegen'd vec_cosine calls per row, map-side), then a
    * two-phase (doc, query-token) MAX — shuffle carries |docs|·|Q|
    * rows, never the corpus — and a |docs|-sized SUM. At 100 TB the
    * per-(doc,token) max is exactly the same bounded-state aggregate;
    * a probe-set of queries rides the same plan with qid in the key.
    * Rounded at the max (6dp) so cross-engine cosine ulps can't leak
    * into the sum, then the ≤8-term sum is exact to re-round.
    */
  q("sim_maxsim",
    """WITH probes AS (SELECT vec_id AS qid, embedding AS qemb
      |                FROM embeddings WHERE vec_id < 8),
      |     pm AS (SELECT e.label, p.qid,
      |                   round(max(list_cosine_similarity(
      |                     CAST(e.embedding AS DOUBLE[]),
      |                     CAST(p.qemb AS DOUBLE[]))), 6) AS m
      |            FROM embeddings e, probes p GROUP BY 1, 2)
      |SELECT label, round(sum(m), 6) AS maxsim, CAST(count(*) AS INTEGER) AS n_q
      |FROM pm GROUP BY label ORDER BY label""") { (s, d) =>
    val all = T(s, d, "embeddings")
    val probes = all.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    all.crossJoin(broadcast(probes))
      .select(col("label"), col("qid"),
        graft.functions.vec.cosine(col("embedding"), col("qemb")).as("cos"))
      .groupBy("label", "qid")
      .agg(round(max(col("cos")), 6).as("m"))
      .groupBy("label")
      .agg(round(sum(col("m")), 6).as("maxsim"), count(lit(1)).cast("int").as("n_q"))
      .reportSorted("label")
  }

  /** Matryoshka staged retrieval (SPEC: Kusupati et al. 2022 — MRL
    * embeddings are trained so PREFIXES of the vector are themselves
    * valid embeddings): rank by cosine over the first 8 of 64 dims
    * (8× cheaper per pair), keep the top-20 candidates per query, then
    * rerank exactly with the full vector and keep the top-5. The same
    * funnel shape as [[q sim_ann_pq_rerank]] but with the coarse
    * representation being a prefix slice instead of a code table — no
    * training pass, no codebook state. Both ranks order by the
    * 6dp-ROUNDED score (checklist rule 5) so a cross-engine cosine ulp
    * can never flip a rank. Scale: stage-1 cost is |corpus|·|probes|
    * dot products of length 8; stage-2 touches 20 candidates per
    * query — the full-width arithmetic never sees the corpus.
    */
  q("sim_matryoshka_rerank",
    """WITH probes AS (
      |  SELECT vec_id AS qid, embedding AS qemb FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
      |     coarse AS (
      |  SELECT p.qid, e.vec_id AS nbr, e.embedding, p.qemb,
      |         CAST(row_number() OVER (PARTITION BY p.qid
      |           ORDER BY round(list_cosine_similarity(CAST(e.embedding[1:8] AS DOUBLE[]),
      |                                                 CAST(p.qemb[1:8] AS DOUBLE[])), 6) DESC,
      |                    e.vec_id) AS INTEGER) AS prn
      |  FROM embeddings e, probes p WHERE e.vec_id <> p.qid),
      |     fine AS (
      |  SELECT qid, nbr,
      |         round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
      |                                      CAST(qemb AS DOUBLE[])), 6) AS cos
      |  FROM coarse WHERE prn <= 20),
      |     ranked AS (
      |  SELECT qid, nbr, cos,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS INTEGER) AS rn
      |  FROM fine)
      |SELECT qid, nbr, cos, rn FROM ranked WHERE rn <= 5 ORDER BY qid, rn""") { (s, d) =>
    val all = T(s, d, "embeddings").select("vec_id", "embedding")
    val probes = all.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val wCoarse = Window.partitionBy("qid")
      .orderBy(round(col("pcos"), 6).desc, col("vec_id").asc)
    val wFine = Window.partitionBy("qid").orderBy(col("cos").desc, col("nbr").asc)
    all.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("pcos", graft.functions.vec.cosine(
        slice(col("embedding"), 1, 8), slice(col("qemb"), 1, 8)))
      .withColumn("prn", row_number().over(wCoarse))
      .filter(col("prn") <= 20)
      .select(col("qid"), col("vec_id").as("nbr"),
        round(graft.functions.vec.cosine(col("embedding"), col("qemb")), 6).as("cos"))
      .withColumn("rn", row_number().over(wFine))
      .filter(col("rn") <= 5)
      .reportSorted("qid", "rn")
  }

  /** ANN quality monitoring as a first-class query: recall@10 of the
    * 8-plane LSH candidate set against the exact brute-force top-10,
    * per probe (SPEC: the recall@k curve every ANN deployment tracks;
    * a bucket-collapse regression — e.g. degenerate hyperplanes on
    * normalized data — shows up here as recall 1.0 with a corpus-sized
    * candidate count, or recall → 0 with an empty one). Composes the
    * registered generators: same bucket CTE as sim_ann_lsh, same
    * brute-force rank as sim_cosine_topk — the EVAL is one left join +
    * two bounded aggregates on (probe, nbr) keys. At 100 TB the exact
    * side stays probe-set-bounded (broadcast probes over one corpus
    * pass), which is exactly how production recall audits sample.
    */
  q("sim_ann_recall_eval",
    s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql(8)} AS bucket FROM embeddings),
       |     probes AS (SELECT vec_id AS qid, embedding AS qemb
       |                FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
       |     exact AS (SELECT qid, nbr FROM (
       |       SELECT p.qid, e.vec_id AS nbr,
       |              row_number() OVER (PARTITION BY p.qid
       |                ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                                CAST(p.qemb AS DOUBLE[])) DESC,
       |                         e.vec_id) AS rn
       |       FROM embeddings e, probes p WHERE e.vec_id <> p.qid) t WHERE rn <= 10),
       |     cand AS (SELECT l.vec_id AS qid, r.vec_id AS nbr
       |              FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id
       |              WHERE l.vec_id IN (0,1,2,3,4)),
       |     h AS (SELECT e.qid, count(c.nbr) AS hits
       |           FROM exact e LEFT JOIN cand c ON c.qid = e.qid AND c.nbr = e.nbr
       |           GROUP BY 1),
       |     nc AS (SELECT qid, count(*) AS n_cand FROM cand GROUP BY 1)
       |SELECT h.qid, CAST(coalesce(nc.n_cand, 0) AS BIGINT) AS n_cand,
       |       CAST(h.hits AS BIGINT) AS hits, round(h.hits / 10.0, 2) AS recall
       |FROM h LEFT JOIN nc USING (qid) ORDER BY qid""".stripMargin) { (s, d) =>
    val probeIds = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = cosineTopK(s, d, k = 10, probeIds = probeIds).select("qid", "nbr")
    val b = lshBucketed(s, d, nPlanes = 8)
    val cand = b.filter(col("vec_id").isin(probeIds: _*))
      .select(col("bucket"), col("vec_id").as("qid"))
      .join(b.select(col("bucket"), col("vec_id").as("nbr")), Seq("bucket"))
      .filter(col("qid") =!= col("nbr"))
      .select("qid", "nbr")
    val hits = exact.join(cand.withColumn("hit", lit(1L)), Seq("qid", "nbr"), "left")
      .groupBy("qid").agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
    val nCand = cand.groupBy("qid").agg(count(lit(1)).as("n_cand"))
    hits.join(nCand, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("hits"), round(col("hits") / 10.0, 2).as("recall"))
      .reportSorted("qid")
  }

  /** nDCG@10 of the LSH retrieval against exact-cosine ground truth
    * (Järvelin & Kekäläinen 2002) — recall@k (the row above) treats
    * every exact neighbor alike; nDCG is the POSITION-weighted eval a
    * retrieval/RAG pipeline actually reports. Graded relevance of a
    * retrieved doc = 11 − its exact-cosine rank (0 if outside the true
    * top-10); DCG = Σ rel·w(pos) over the LSH candidates' in-bucket
    * cosine ranking, IDCG from the exact ranking itself, both via the
    * SAME formula shape. Position weights 1/log₂(pos+1) snap to the
    * dy20 grid BEFORE the rel multiply (integer·grid-multiple stays a
    * grid multiple, totals ≤ 100 ≪ 2³³ — rule 12), so both 10-term
    * sums are order-exact and the single rounded ratio is
    * engine-identical. Scale: ground truth is the broadcast-probe
    * brute-force pass (eval-sized by contract, like recall_eval);
    * retrieval cost ∝ bucket collisions; everything downstream lives
    * on ≤ 10 rows per probe.
    */
  q("sim_ndcg_eval",
    s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql(8)} AS bucket FROM embeddings),
       |     probes AS (SELECT vec_id AS qid, embedding AS qemb, bucket
       |                FROM bk WHERE vec_id IN (0,1,2,3,4)),
       |     exact AS (SELECT qid, nbr, rn FROM (
       |       SELECT p.qid, e.vec_id AS nbr,
       |              row_number() OVER (PARTITION BY p.qid
       |                ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                                CAST(p.qemb AS DOUBLE[])) DESC,
       |                         e.vec_id) AS rn
       |       FROM embeddings e, probes p WHERE e.vec_id <> p.qid) t WHERE rn <= 10),
       |     retr AS (SELECT qid, nbr, pos FROM (
       |       SELECT p.qid, r.vec_id AS nbr,
       |              row_number() OVER (PARTITION BY p.qid
       |                ORDER BY list_cosine_similarity(CAST(r.embedding AS DOUBLE[]),
       |                                                CAST(p.qemb AS DOUBLE[])) DESC,
       |                         r.vec_id) AS pos
       |       FROM bk r JOIN probes p ON r.bucket = p.bucket AND r.vec_id <> p.qid) t
       |       WHERE pos <= 10),
       |     scored AS (SELECT r.qid, r.pos, coalesce(11 - e.rn, 0) AS rel
       |                FROM retr r LEFT JOIN exact e ON e.qid = r.qid AND e.nbr = r.nbr),
       |     dcg AS (SELECT qid, count(*) AS n_retrieved,
       |                    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits,
       |                    sum(rel * ${Grid.dy20Sql("1.0 / log2(pos + 1)")}) AS dcg
       |             FROM scored GROUP BY 1),
       |     idcg AS (SELECT qid,
       |                     sum((11 - rn) * ${Grid.dy20Sql("1.0 / log2(rn + 1)")}) AS idcg
       |              FROM exact GROUP BY 1)
       |SELECT i.qid, CAST(coalesce(d.n_retrieved, 0) AS BIGINT) AS n_retrieved,
       |       CAST(coalesce(d.hits, 0) AS BIGINT) AS hits,
       |       round(coalesce(d.dcg, 0.0) / i.idcg, 6) AS ndcg
       |FROM idcg i LEFT JOIN dcg d USING (qid) ORDER BY qid""".stripMargin) { (s, d) =>
    val probeIds = Seq(0L, 1L, 2L, 3L, 4L)
    // the corpus×probes ground-truth pass is the expensive stage; DCG
    // relevance and IDCG both consume it — materialize it ONCE
    val exact = cosineTopK(s, d, k = 10, probeIds = probeIds)
      .select("qid", "nbr", "rn").localCheckpoint()
    val b = lshBucketed(s, d, nPlanes = 8)
    val probes = b.filter(col("vec_id").isin(probeIds: _*))
      .select(col("bucket"), col("vec_id").as("qid"), col("embedding").as("qemb"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nbr").asc)
    val retr = b.select(col("bucket"), col("vec_id").as("nbr"), col("embedding").as("nemb"))
      .join(probes, Seq("bucket"))
      .filter(col("nbr") =!= col("qid"))
      .withColumn("cos", graft.functions.vec.cosine(col("nemb"), col("qemb")))
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= 10)
      .select("qid", "nbr", "pos")
    def wOf(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      Grid.dy20(lit(1.0) / log2(p + 1))
    val scored = retr
      .join(exact.withColumn("rel", lit(11) - col("rn")).drop("rn"),
        Seq("qid", "nbr"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val dcg = scored.groupBy("qid").agg(
      count(lit(1)).as("n_retrieved"),
      sum(when(col("rel") > 0, lit(1L)).otherwise(lit(0L))).as("hits"),
      sum(col("rel") * wOf(col("pos"))).as("dcg"))
    val idcg = exact.groupBy("qid").agg(
      sum((lit(11) - col("rn")) * wOf(col("rn"))).as("idcg"))
    idcg.join(dcg, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 6).as("ndcg"))
      .reportSorted("qid") // 5 eval probes = eval-sized by contract
  }

  /** One-pass distributed PCA sufficient statistics + driver-side
    * eigen-solve for dim-sized matrices: ONE corpus pass produces
    * n, Σx (via a 64-group two-phase agg) and Σxxᵀ (via a 4096-group
    * two-phase agg — map-side combine means the shuffle carries
    * dim² rows PER PARTITION, never the corpus), then the centered
    * covariance C = Σxxᵀ/n − μμᵀ is a 64×64 driver matrix and power
    * iteration on it is microseconds — the classic "big n, small d"
    * factorization split (same discipline as the k-means/PQ trainers:
    * driver state is O(d²), bounded). Sign-normalized so the result
    * is deterministic (dominant eigenvector is unique up to sign).
    */
  private[ops] def gramTopComponent(emb: DataFrame): (Long, Double, Double, Array[Double]) = {
    val rows = emb.select(posexplode(col("embedding")).as(Seq("i", "xi_f")), col("embedding"))
      .select(col("i"), col("xi_f").cast("double").as("xi"), col("embedding"))
    val gram = rows
      .select(col("i"), col("xi"), posexplode(col("embedding")).as(Seq("j", "xj_f")))
      .groupBy("i", "j").agg(sum(col("xi") * col("xj_f").cast("double")).as("sxx"))
      .collect()
    val sums = rows.groupBy("i").agg(sum("xi").as("sx"), count(lit(1)).as("cnt")).collect()
    val dim = sums.length
    // empty corpus: no components — return the empty shape instead of
    // crashing on head (the oracle returns zero rows)
    if (dim == 0) return (0L, 0.0, 0.0, Array.empty[Double])
    val n = sums.head.getLong(2)
    // floor-quantize the ONLY nondeterministic inputs — the shuffled
    // Σx and Σxᵢxⱼ sums — to the 1e-6 grid (the pageRank device);
    // everything downstream (covariance, 300 power-iteration rounds,
    // Rayleigh quotient) is then pure deterministic double arithmetic
    // any engine replays bit-identically
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5000005) / 1e6
    val mu = Array.ofDim[Double](dim)
    sums.foreach(r => mu(r.getInt(0)) = q6(r.getDouble(1)) / n)
    val c = Array.ofDim[Double](dim, dim)
    gram.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      c(i)(j) = q6(r.getDouble(2)) / n - mu(i) * mu(j)
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    (1 to 300).foreach { _ =>
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => c(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val lambda = (0 until dim).map(i => v(i) * (0 until dim).map(j => c(i)(j) * v(j)).sum).sum
    val trace = (0 until dim).map(i => c(i)(i)).sum
    // sign convention: the largest-|component| coordinate is positive
    val kMax = v.indices.maxBy(i => (math.abs(v(i)), -i))
    val signed = if (v(kMax) < 0) v.map(-_) else v
    (n, lambda, lambda / trace, signed)
  }

  /** HASH-CHECKED since round 10: with [[gramTopComponent]]'s input
    * sums quantized, the whole eigen-solve is deterministic double
    * arithmetic — and SQL CAN replay it: the oracle rebuilds the
    * quantized covariance, runs the 300 power-iteration rounds as a
    * RECURSIVE CTE over a DOUBLE[] state (matvec + normalize per
    * step, list_reduce's sequential fold matching Scala's in-order
    * sums), then reproduces the Rayleigh quotient, the sign rule
    * (largest-|component| positive), and the top-8 report. Output is
    * 8 plain rows (rank, pos, loading, λ₁, ratio, n) — no formatted
    * strings (BigDecimal vs engine double-formatting would never
    * hash-agree; checklist rule 10 territory).
    */
  q("sim_pca_top_component",
    """WITH RECURSIVE
      |ex AS (
      |  SELECT i.i, j.j,
      |         floor(sum(CAST(e.embedding[i.i+1] AS DOUBLE) * CAST(e.embedding[j.j+1] AS DOUBLE))
      |               * 1000000 + CAST(0.5000005 AS DOUBLE)) / 1000000 AS qsxx
      |  FROM embeddings e, unnest(generate_series(0,63)) i(i), unnest(generate_series(0,63)) j(j)
      |  GROUP BY i.i, j.j),
      |sx AS (
      |  SELECT i.i,
      |         floor(sum(CAST(e.embedding[i.i+1] AS DOUBLE)) * 1000000
      |               + CAST(0.5000005 AS DOUBLE)) / 1000000 AS qsx,
      |         count(*) AS n
      |  FROM embeddings e, unnest(generate_series(0,63)) i(i)
      |  GROUP BY i.i),
      |cm AS (
      |  SELECT ex.i, ex.j,
      |         ex.qsxx / si.n - (si.qsx / si.n) * (sj.qsx / sj.n) AS c
      |  FROM ex JOIN sx si ON si.i = ex.i JOIN sx sj ON sj.i = ex.j),
      |gm AS (
      |  SELECT list(r ORDER BY i) AS g FROM (
      |    SELECT i, list(c ORDER BY j) AS r FROM cm GROUP BY i) t),
      |pit(k, v) AS (
      |  SELECT 0, [CAST(0.125 AS DOUBLE) FOR q IN range(0, 64)]
      |  UNION ALL
      |  SELECT t.k + 1,
      |         [t.w[i+1] / sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |            [t.w[x+1] * t.w[x+1] FOR x IN range(0, 64)]), (a,b) -> a + b))
      |          FOR i IN range(0, 64)]
      |  FROM (SELECT p.k AS k,
      |               [list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |                  [gm.g[i+1][j+1] * p.v[j+1] FOR j IN range(0, 64)]), (a,b) -> a + b)
      |                FOR i IN range(0, 64)] AS w
      |        FROM pit p, gm WHERE p.k < 300) t),
      |fin AS (SELECT v FROM pit WHERE k = 300),
      |lam AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           [f.v[i+1] * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |              [gm.g[i+1][j+1] * f.v[j+1] FOR j IN range(0, 64)]), (a,b) -> a + b)
      |            FOR i IN range(0, 64)]), (a,b) -> a + b) AS lambda
      |  FROM fin f, gm),
      |tr AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           [gm.g[i+1][i+1] FOR i IN range(0, 64)]), (a,b) -> a + b) AS trace
      |  FROM gm),
      |comp AS (SELECT u.i, f.v[u.i+1] AS x FROM fin f, unnest(generate_series(0,63)) u(i)),
      |km AS (SELECT i FROM comp ORDER BY abs(x) DESC, i LIMIT 1),
      |sg AS (SELECT CASE WHEN c.x < 0 THEN CAST(-1.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS s
      |       FROM comp c, km WHERE c.i = km.i),
      |top AS (SELECT c.i AS pos, c.x * sg.s AS loading,
      |               row_number() OVER (ORDER BY abs(c.x) DESC, c.i) AS rk
      |        FROM comp c, sg)
      |SELECT CAST(rk AS INTEGER) AS comp_rank, CAST(pos AS INTEGER) AS pos,
      |       floor(loading * 10000 + CAST(0.5000005 AS DOUBLE)) / 10000 AS loading,
      |       floor(lam.lambda * 10000 + CAST(0.5000005 AS DOUBLE)) / 10000 AS lambda1,
      |       floor(lam.lambda / tr.trace * 1000000 + CAST(0.5000005 AS DOUBLE)) / 1000000 AS explained_ratio,
      |       CAST((SELECT max(n) FROM sx) AS BIGINT) AS n
      |FROM top, lam, tr WHERE rk <= 8 ORDER BY comp_rank""") { (s, d) =>
    val (n, lambda, ratio, v) = gramTopComponent(
      T(s, d, "embeddings").select("embedding"))
    def q4(x: Double): Double = math.floor(x * 1e4 + 0.5000005) / 1e4
    val rows = v.zipWithIndex.sortBy { case (x, i) => (-math.abs(x), i) }.take(8)
      .zipWithIndex.map { case ((x, pos), rk) =>
        (rk + 1, pos, q4(x), q4(lambda),
          math.floor(ratio * 1e6 + 0.5000005) / 1e6, n)
      }
    import s.implicits._
    rows.toSeq.toDF("comp_rank", "pos", "loading", "lambda1", "explained_ratio", "n")
  }

  /** Greedy Maximal-Marginal-Relevance selection over a BOUNDED
    * per-query candidate set (SPEC: Carbonell & Goldstein 1998 —
    * picks argmax λ·rel − (1−λ)·max-sim-to-already-picked, the
    * standard redundancy-aware re-rank after any ANN funnel).
    * `cands` columns: (qid, cid, rel, cemb). k fixed rounds, each:
    * one anti-join (drop picked), one qid-equi join against the ≤k
    * picked rows, one two-phase (qid,cid) max, one rank window —
    * every frame is candidates-sized (|queries|·≤20 rows), so the
    * loop costs k tiny co-partitioned stages at ANY corpus scale;
    * the corpus was left behind at candidate generation. Scores are
    * rounded before each rank (checklist rule 5), ties by cid.
    */
  private[ops] def mmrSelect(cands: DataFrame, k: Int, lam: Double): DataFrame = {
    val wq = Window.partitionBy("qid").orderBy(col("rel").desc, col("cid").asc)
    var selected = cands.withColumn("rn", row_number().over(wq))
      .filter(col("rn") === 1)
      .select(col("qid"), col("cid"), col("rel"), col("cemb"), lit(1).as("pick"))
    (2 to k).foreach { r =>
      val selNow = selected.select(col("qid"), col("cid").as("sid"), col("cemb").as("semb"))
      val scored = cands
        .join(selected.select("qid", "cid"), Seq("qid", "cid"), "left_anti")
        .join(selNow, Seq("qid"))
        .select(col("qid"), col("cid"), col("rel"),
          round(graft.functions.vec.cosine(col("cemb"), col("semb")), 6).as("sim"))
        .groupBy("qid", "cid")
        .agg(first(col("rel")).as("rel"), max(col("sim")).as("maxsim"))
        // floor-quantized, NOT round(): λ·rel over 1e-6-grid rel lands on
        // the 6dp half-grid systematically (λ·k ends in 5 for 10% of
        // candidates), where library round() half-case semantics differ
        // across engines — same device as pageRank, ε shifts the boundary
        .withColumn("score",
          floor((lit(lam) * col("rel") - lit(1.0 - lam) * col("maxsim")) * 1e6
            + lit(0.5000005)) / 1e6)
      val wpick = Window.partitionBy("qid").orderBy(col("score").desc, col("cid").asc)
      val pick = scored.withColumn("rn", row_number().over(wpick)).filter(col("rn") === 1)
        .join(cands.select("qid", "cid", "cemb"), Seq("qid", "cid"))
        .select(col("qid"), col("cid"), col("rel"), col("cemb"), lit(r).as("pick"))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected
  }

  /** MMR-diversified retrieval: exact top-20 relevance candidates per
    * probe re-ranked by [[mmrSelect]] with λ = 0.7 — 5 picks that
    * trade relevance against redundancy. HASH-CHECKED since round 10:
    * the greedy argmax-over-remaining IS SQL-expressible once the
    * candidate set is bounded — the oracle unrolls the 5 selection
    * rounds as chained CTEs (pairwise candidate sims precomputed once,
    * each round an anti-membership filter + max-sim against the
    * growing picked set + rank-1 pick) with the SAME floor-quantized
    * score as [[mmrSelect]]; λ constants go through CAST(.. AS DOUBLE)
    * so decimal literals can't diverge. The anti-redundancy contract
    * (a planted near-duplicate of the top hit is NOT picked second)
    * stays pinned in OpsSemanticsSpec.
    */
  q("sim_mmr_diversify", {
    val rounds = (2 to 5).map { r =>
      s""",
         |     sc$r AS (
         |  SELECT c.qid, c.cid, c.rel,
         |         floor((CAST(0.7 AS DOUBLE) * c.rel -
         |                (1 - CAST(0.7 AS DOUBLE)) * m.ms) * 1000000 +
         |               CAST(0.5000005 AS DOUBLE)) / 1000000 AS score
         |  FROM cands c
         |  JOIN (SELECT ps.qid, ps.a AS cid, max(ps.sim) AS ms
         |        FROM ps JOIN sel${r - 1} s ON ps.qid = s.qid AND ps.b = s.cid
         |        GROUP BY ps.qid, ps.a) m ON m.qid = c.qid AND m.cid = c.cid
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s2
         |                    WHERE s2.qid = c.qid AND s2.cid = c.cid)),
         |     pk$r AS (
         |  SELECT qid, cid, rel, $r AS pick FROM (
         |    SELECT qid, cid, rel,
         |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
         |    FROM sc$r) t WHERE rn = 1),
         |     sel$r AS (SELECT qid, cid FROM sel${r - 1}
         |               UNION ALL SELECT qid, cid FROM pk$r)""".stripMargin
    }.mkString
    s"""WITH probes AS (
       |  SELECT vec_id AS qid, embedding AS qemb FROM embeddings
       |  WHERE vec_id IN (0, 1, 2, 3, 4)),
       |     cands AS (
       |  SELECT qid, cid, rel FROM (
       |    SELECT p.qid, e.vec_id AS cid,
       |           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                        CAST(p.qemb AS DOUBLE[])), 6) AS rel,
       |           row_number() OVER (PARTITION BY p.qid
       |             ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                                   CAST(p.qemb AS DOUBLE[])), 6) DESC,
       |                      e.vec_id) AS rn
       |    FROM embeddings e, probes p WHERE e.vec_id <> p.qid) t WHERE rn <= 20),
       |     ps AS (
       |  SELECT c.qid, c.cid AS a, c2.cid AS b,
       |         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                      CAST(eb.embedding AS DOUBLE[])), 6) AS sim
       |  FROM cands c
       |  JOIN cands c2 ON c.qid = c2.qid AND c.cid <> c2.cid
       |  JOIN embeddings ea ON ea.vec_id = c.cid
       |  JOIN embeddings eb ON eb.vec_id = c2.cid),
       |     pk1 AS (
       |  SELECT qid, cid, rel, 1 AS pick FROM (
       |    SELECT qid, cid, rel,
       |           row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rn
       |    FROM cands) t WHERE rn = 1),
       |     sel1 AS (SELECT qid, cid FROM pk1)""".stripMargin + rounds +
      """
        |SELECT qid, CAST(pick AS INTEGER) AS pick, cid, rel FROM (
        |  SELECT * FROM pk1 UNION ALL SELECT * FROM pk2 UNION ALL SELECT * FROM pk3
        |  UNION ALL SELECT * FROM pk4 UNION ALL SELECT * FROM pk5) u
        |ORDER BY qid, pick""".stripMargin
  }) { (s, d) =>
    val all = T(s, d, "embeddings").select("vec_id", "embedding")
    val probes = all.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val wq = Window.partitionBy("qid").orderBy(col("rel").desc, col("cid").asc)
    val cands = all.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(graft.functions.vec.cosine(col("embedding"), col("qemb")), 6).as("rel"),
        col("embedding").as("cemb"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20).drop("rn")
      .localCheckpoint() // reused every round of the greedy loop
    mmrSelect(cands, k = 5, lam = 0.7)
      .select(col("qid"), col("pick").cast("int").as("pick"), col("cid"), col("rel"))
      .reportSorted("qid", "pick")
  }

  /** Importance-weighted sampling without replacement (SPEC:
    * Efraimidis & Spirakis 2006 — rank by −ln(u)/w and keep the
    * smallest k keys; a one-pass, mergeable formulation of weighted
    * reservoir sampling): sample 200 docs with probability ∝ n_chars,
    * the standard quality-weighted subcorpus draw. u comes from the
    * LCG key rule (pipeline_epoch_shuffle) so the draw is
    * deterministic, restart-stable, and engine-reproducible — no RNG
    * state. The k-smallest cut is TakeOrderedAndProject (each map task
    * keeps a local top-k; the driver merges k·partitions rows — never
    * a global sort). Keys are ROUNDED to 9dp before ranking with a
    * doc_id tie-break, so a cross-engine ln() ulp cannot flip the
    * order.
    */
  q("pipeline_weighted_sample",
    """WITH k AS (
      |  SELECT doc_id, n_chars,
      |         round(-ln(((doc_id * 1103515245 + 12345) % 2147483648 + 0.5)
      |                   / 2147483648.0) / n_chars, 9) AS skey
      |  FROM documents),
      |     s AS (SELECT doc_id, n_chars, skey FROM k ORDER BY skey, doc_id LIMIT 200)
      |SELECT doc_id, n_chars, skey FROM s ORDER BY doc_id""") { (s, d) =>
    val u = (pmod(col("doc_id") * lit(1103515245L) + lit(12345L), lit(2147483648L))
      .cast("double") + lit(0.5)) / lit(2147483648.0)
    T(s, d, "documents")
      .select(col("doc_id"), col("n_chars"),
        round(-log(u) / col("n_chars"), 9).as("skey"))
      .orderBy(col("skey"), col("doc_id")).limit(200)
      .orderBy("doc_id") // bounded k rows
  }

  /** Gopher/MassiveText rule-based quality gate (SPEC: Rae et al. 2021
    * §A1.1 — word-count bounds, mean-word-length bounds, alphabetic-word
    * ratio, required stopword hits; the line-level rules degenerate on
    * this single-line corpus and are deliberately omitted rather than
    * emitted as constant zeros). Pure per-row HOF arithmetic over the
    * token array — zero shuffle, whole-stage codegen, one corpus pass at
    * any scale. `kept` is 0/1 BIGINT (type-stable, dq_constraint_check
    * precedent); every ratio feeding it is a single exact-int division,
    * so the flag is ulp-proof without rank machinery.
    */
  q("text_gopher_filter",
    """SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
      |       max_word_len, round(alpha_ratio, 6) AS alpha_ratio, stop_hits, kept
      |FROM (
      |  SELECT doc_id,
      |         CAST(len(w) AS INTEGER) AS n_words,
      |         CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE)
      |           / greatest(len(w), 1) AS mean_word_len,
      |         CAST(list_max(list_transform(w, t -> len(t))) AS INTEGER) AS max_word_len,
      |         CAST(len(list_filter(w, t -> regexp_full_match(t, '[a-z]+'))) AS DOUBLE)
      |           / greatest(len(w), 1) AS alpha_ratio,
      |         CAST(len(list_filter(['the', 'a', 'and', 'of', 'to'],
      |                              sw -> list_contains(w, sw))) AS INTEGER) AS stop_hits,
      |         CAST(len(w) BETWEEN 10 AND 100000
      |              AND CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE)
      |                    / greatest(len(w), 1) BETWEEN 2 AND 12
      |              AND CAST(len(list_filter(w, t -> regexp_full_match(t, '[a-z]+'))) AS DOUBLE)
      |                    / greatest(len(w), 1) >= 0.8
      |              AND len(list_filter(['the', 'a', 'and', 'of', 'to'],
      |                                  sw -> list_contains(w, sw))) >= 2 AS BIGINT) AS kept
      |  FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents) t) t2
      |ORDER BY doc_id""") { (s, d) =>
    val w = col("w")
    val nWords = size(w)
    val sumLen = expr("aggregate(w, 0, (acc, t) -> acc + length(t))")
    val meanLen = sumLen.cast("double") / greatest(nWords, lit(1))
    val alphaRatio =
      size(expr("filter(w, t -> t rlike '^[a-z]+$')")).cast("double") /
        greatest(nWords, lit(1))
    val stopHits = size(expr(
      "filter(array('the', 'a', 'and', 'of', 'to'), sw -> array_contains(w, sw))"))
    T(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        nWords.cast("int").as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        expr("array_max(transform(w, t -> length(t)))").cast("int").as("max_word_len"),
        round(alphaRatio, 6).as("alpha_ratio"),
        stopHits.cast("int").as("stop_hits"),
        (nWords.between(10, 100000) && meanLen.between(2, 12) &&
          alphaRatio >= 0.8 && stopHits >= 2).cast("long").as("kept"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Zipf-law fit over the corpus word-frequency distribution (SPEC:
    * Zipf 1949; a healthy natural corpus shows ln(freq) ≈ a + s·ln(rank)
    * with s ≈ −1 — a collapsed or templated crawl shows up as a slope
    * far from −1, making this a standard corpus-level health probe).
    * Scale shape: one vocab-sized two-phase word count, then
    * TakeOrderedAndProject caps the fit set at the top-1000 ranks —
    * the single-partition rank window after it touches ≤1000 rows by
    * construction (bounded, never corpus-sized). Rank ties share a
    * count, so ln(freq) per rank position — and hence the fit — is
    * deterministic regardless of tie order; the OLS co-moments ride
    * ~1e3-term double sums whose cross-engine ulps sit ~6 orders below
    * the 6dp rounding.
    */
  q("text_zipf_fit",
    """WITH tc AS (
      |  SELECT w, count(*) AS c
      |  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents) t GROUP BY 1),
      |     top AS (SELECT c FROM tc ORDER BY c DESC, w LIMIT 1000),
      |     rk AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC) AS DOUBLE)) AS lr,
      |                   ln(CAST(c AS DOUBLE)) AS lf
      |            FROM top),
      |     fit AS (SELECT count(*) AS n, sum(lr) AS sr, sum(lf) AS sf,
      |                    sum(lr * lr) AS srr, sum(lr * lf) AS srf
      |             FROM rk),
      |     tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
      |                    CAST(count(*) AS BIGINT) AS vocab_size FROM tc)
      |SELECT tot.n_tokens, tot.vocab_size, CAST(fit.n AS INTEGER) AS n_ranks,
      |       round((fit.n * fit.srf - fit.sr * fit.sf)
      |             / nullif(fit.n * fit.srr - fit.sr * fit.sr, 0), 6) AS zipf_slope,
      |       round((fit.sf - (fit.n * fit.srf - fit.sr * fit.sf)
      |                       / nullif(fit.n * fit.srr - fit.sr * fit.sr, 0) * fit.sr)
      |             / fit.n, 6) AS zipf_intercept
      |FROM tot, fit""") { (s, d) =>
    val tc = T(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // TakeOrderedAndProject: the limit rides the sort, so the rank
    // window below is bounded at 1000 rows — single partition by design
    val top = tc.orderBy(col("c").desc, col("w")).limit(1000).select("c")
    val rk = top
      .withColumn("r", row_number().over(Window.orderBy(col("c").desc)))
      .select(log(col("r").cast("double")).as("lr"), log(col("c").cast("double")).as("lf"))
    val fit = rk.agg(count(lit(1)).as("n"), sum("lr").as("sr"), sum("lf").as("sf"),
      sum(col("lr") * col("lr")).as("srr"), sum(col("lr") * col("lf")).as("srf"))
    val tot = tc.agg(sum("c").cast("long").as("n_tokens"),
      count(lit(1)).cast("long").as("vocab_size"))
    val denom = nullif(col("n") * col("srr") - col("sr") * col("sr"), lit(0.0))
    val slope = (col("n") * col("srf") - col("sr") * col("sf")) / denom
    tot.crossJoin(broadcast(fit))
      .select(col("n_tokens"), col("vocab_size"), col("n").cast("int").as("n_ranks"),
        round(slope, 6).as("zipf_slope"),
        round((col("sf") - slope * col("sr")) / col("n"), 6).as("zipf_intercept"))
  }

  /** Perplexity-based corpus filtering (SPEC: CCNet — Wenzek et al.
    * 2019: score each document under a language model, keep the
    * best-scoring half; here the LM is the corpus-trained bigram model
    * shared with [[text_bigram_logprob]]). The keep rule is RANK-based
    * (bottom half by (avg_nll, doc_id)), not a score threshold — the
    * rank rides rounded 6dp scores already proven hash-equal across
    * engines, so the cut is integer-deterministic where a raw-double
    * threshold could ulp-flip boundary docs. The global rank reuses the
    * two-pass range-bucket machinery (no single-partition exchange);
    * the half-count comes from a broadcast 1-row aggregate.
    */
  q("pipeline_perplexity_filter",
    """WITH tk AS (SELECT doc_id, str_split(text, ' ') AS tok FROM documents),
      |     bg AS (SELECT doc_id,
      |              unnest([tok[i] || ' ' || tok[i+1] FOR i IN range(1, len(tok))]) AS b
      |            FROM tk),
      |     bc AS (SELECT b, count(*) AS cb FROM bg GROUP BY 1),
      |     uc AS (SELECT str_split(b, ' ')[1] AS w, count(*) AS cu FROM bg GROUP BY 1),
      |     sc AS (SELECT g.doc_id,
      |                   round(-avg(ln(CAST(bc.cb AS DOUBLE) / uc.cu)), 6) AS avg_nll
      |            FROM bg g JOIN bc ON bc.b = g.b
      |            JOIN uc ON uc.w = str_split(g.b, ' ')[1]
      |            GROUP BY g.doc_id),
      |     r AS (SELECT doc_id, avg_nll,
      |                  CAST(row_number() OVER (ORDER BY avg_nll, doc_id) AS BIGINT) AS rnk,
      |                  count(*) OVER () AS n
      |           FROM sc)
      |SELECT doc_id, avg_nll, rnk FROM r WHERE rnk <= n // 2 ORDER BY doc_id""") { (s, d) =>
    val bg = T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .filter(size(col("tok")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tok) - 2), i -> concat_ws(' ', slice(tok, i + 1, 2)))")).as("b"))
      .withColumn("w1", substring_index(col("b"), " ", 1))
    val bc = bg.groupBy("b").agg(count(lit(1)).as("cb"))
    val uc = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
    val sc = bg.join(bc, Seq("b"))
      .join(uc, Seq("w1"))
      .groupBy("doc_id")
      .agg(round(-avg(log(col("cb").cast("double") / col("cu"))), 6).as("avg_nll"))
    val half = sc.agg((count(lit(1)) / 2).cast("long").as("half"))
    WindowOps.globalRowNumber(sc, Seq(col("avg_nll").asc, col("doc_id").asc))
      .withColumnRenamed("global_rank", "rnk")
      .crossJoin(broadcast(half))
      .filter(col("rnk") <= col("half"))
      .select(col("doc_id"), col("avg_nll"), col("rnk"))
      .orderBy("doc_id") // surviving half of the corpus = input-sized
  }

  // ----------------------------------------- mixture & curation (r11b)
  // (contentBucket / contentBucketSql — the shared keep-set selector —
  // are defined once next to pipeline_mix_weighted, their first user)

  /** Temperature-flattened source mixing — the multilingual sampling
    * law (SPEC: Conneau & Lample 2019 §3.1; XLM-R, Conneau et al. 2020
    * §3): sample domains with q_s ∝ p_s^α, α < 1, so head domains are
    * downweighted and the tail keeps coverage; here α = 1/2. α = 1/2
    * is deliberate cross-engine engineering: p^(1/2) is `sqrt`, the one
    * power IEEE 754 REQUIRES correctly rounded, so Spark and DuckDB
    * produce the bit-identical double where libm `pow` carries no such
    * guarantee and may ulp-differ across implementations. Each q_s is
    * then snapped onto the 2⁻²⁰ dyadic grid BEFORE Σq so the
    * normalizer is a sum of grid multiples — order/tree-shape-exact
    * (the WindowOps dy20 device), hence identical under any partial
    * aggregation schedule. Selection itself is the deterministic
    * content-hash bucket against a #domains-sized broadcast rate
    * table: at 100 TB the only data-sized work is one scan + one
    * map-side filter; the aggs are domain-cardinality-sized.
    */
  q("pipeline_mix_temperature",
    s"""WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |     t AS (SELECT CAST(sum(n) AS DOUBLE) AS n_total FROM cnt),
      |     qa AS (
      |  SELECT source, n,
      |         floor(sqrt(CAST(n AS DOUBLE) / t.n_total) * 1048576.0 + 0.5)
      |           / 1048576.0 AS qs
      |  FROM cnt, t),
      |     z AS (SELECT sum(qs) AS z FROM qa),
      |     r AS (
      |  SELECT qa.source,
      |         least(CAST(1.0 AS DOUBLE),
      |               CAST(0.5 AS DOUBLE) * t.n_total * qa.qs / (z.z * qa.n)) AS rate
      |  FROM qa, t, z),
      |     fp AS (
      |  SELECT doc_id, source,
      |    $contentBucketSql AS bucket
      |  FROM documents)
      |SELECT fp.doc_id, fp.source FROM fp JOIN r ON r.source = fp.source
      |WHERE fp.bucket < r.rate * 1000.0
      |ORDER BY fp.doc_id""") { (s, d) =>
    val docs = T(s, d, "documents")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum("n").cast("double").as("n_total"))
    // q_s = dy20(sqrt(n_s / N)): sqrt is correctly rounded in both
    // engines; the grid snap makes Σq order-exact
    val qa = counts.crossJoin(broadcast(totals))
      .withColumn("qs",
        floor(sqrt(col("n").cast("double") / col("n_total")) * lit(1048576.0)
          + lit(0.5)) / lit(1048576.0))
    val z = qa.agg(sum("qs").as("z"))
    // rate_s = min(1, B·(q_s/Z)/n_s) with budget B = 0.5·N; FP
    // association mirrors the oracle term-for-term
    val rates = qa.crossJoin(broadcast(z))
      .select(col("source"), least(lit(1.0),
        lit(0.5) * col("n_total") * col("qs") / (col("z") * col("n")))
        .as("rate"))
    docs
      .withColumn("bucket", contentBucket)
      .join(broadcast(rates), Seq("source"))
      .filter(col("bucket") < col("rate") * 1000.0)
      .select("doc_id", "source")
      .orderBy("doc_id") // kept set is input-sized
  }

  /** Preference-pair construction — the DPO/RLHF data-curation step
    * (SPEC: Rafailov et al. 2023, Direct Preference Optimization §4:
    * training rows are (chosen, rejected) pairs): within each
    * (source, lang) group, zip the i-th best-scoring document with the
    * i-th worst as (chosen, rejected), i ≤ min(5, ⌊n/2⌋) so the two
    * halves never overlap and no document pairs with itself. The score
    * is the rounded type-token ratio (the text_ttr quality signal);
    * rank ties break on doc_id so pairing is total-order
    * deterministic, and equal-score pairs are dropped (margin must be
    * strictly positive to encode a preference). Shape: one window
    * rank per direction over (source, lang) partitions + one
    * equi-join on (group, i) — output is ≤ 5·|groups| rows, bounded
    * by group cardinality, never by corpus size.
    */
  q("pipeline_pref_pairs",
    """WITH s AS (
      |  SELECT doc_id, source, lang,
      |         round(CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
      |               / len(str_split(text, ' ')), 6) AS score
      |  FROM documents WHERE text IS NOT NULL),
      |     rk AS (
      |  SELECT source, lang, doc_id, score,
      |         row_number() OVER (PARTITION BY source, lang
      |                            ORDER BY score DESC, doc_id ASC) AS rb,
      |         row_number() OVER (PARTITION BY source, lang
      |                            ORDER BY score ASC, doc_id DESC) AS rw,
      |         count(*) OVER (PARTITION BY source, lang) AS cnt
      |  FROM s)
      |SELECT c.source, c.lang, c.rb AS pair_rank,
      |       c.doc_id AS chosen_id, r.doc_id AS rejected_id,
      |       c.score AS chosen_score, r.score AS rejected_score,
      |       round(c.score - r.score, 6) AS margin
      |FROM rk c JOIN rk r
      |  ON c.source = r.source AND c.lang = r.lang AND c.rb = r.rw
      |WHERE c.rb <= least(5, c.cnt // 2) AND c.score > r.score
      |ORDER BY c.source, c.lang, c.rb""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val scored = T(s, d, "documents")
      // NULL text would score NULL, and the two engines then disagree
      // on where NULLs land in the rank windows (Spark ASC=NULLS FIRST
      // vs DuckDB ASC=NULLS LAST), shifting every real rank — filter
      // defensively like the sibling encode/lz78 rows do
      .filter(col("text").isNotNull)
      .withColumn("tok", split(col("text"), " "))
      .select(col("doc_id"), col("source"), col("lang"),
        round(size(array_distinct(col("tok"))).cast("double")
          / size(col("tok")), 6).as("score"))
    val wBest = Window.partitionBy("source", "lang")
      .orderBy(col("score").desc, col("doc_id").asc)
    val wWorst = Window.partitionBy("source", "lang")
      .orderBy(col("score").asc, col("doc_id").desc)
    val ranked = scored.select(col("source"), col("lang"), col("doc_id"),
      col("score"), row_number().over(wBest).as("rb"),
      row_number().over(wWorst).as("rw"),
      count(lit(1)).over(Window.partitionBy("source", "lang")).as("cnt"))
    ranked.as("c").join(ranked.as("r"),
        col("c.source") === col("r.source") && col("c.lang") === col("r.lang")
          && col("c.rb") === col("r.rw"))
      .filter(col("c.rb") <= least(lit(5), expr("c.cnt div 2"))
        && col("c.score") > col("r.score"))
      .select(col("c.source").as("source"), col("c.lang").as("lang"),
        col("c.rb").as("pair_rank"), col("c.doc_id").as("chosen_id"),
        col("r.doc_id").as("rejected_id"), col("c.score").as("chosen_score"),
        col("r.score").as("rejected_score"),
        round(col("c.score") - col("r.score"), 6).as("margin"))
      .reportSorted("source", "lang", "pair_rank") // ≤ 5·|groups| rows
  }

  /** Cross-source contamination audit — the corpus-governance matrix
    * behind every mixture decision (SPEC: Lee et al. 2021 §5 measure
    * duplication ACROSS corpora; Dodge et al. 2021, C4 audit): for
    * each pair of sources, how many verbatim 8-token windows they
    * share, and the containment ratio |A∩B| / min(|A|,|B|). Shape:
    * the dedup_substring gram stream distinct'd per (gram, source) →
    * a document-frequency cap (grams in > 16 sources are boilerplate
    * and carry no pair signal — dropped, cap mirrored in the oracle)
    * → a self-equi-join on gram whose fan-out is ≤ C(16,2) = 120 rows
    * per gram BY CONSTRUCTION, never #sources² — the cap is what
    * keeps a universal template gram from emitting a domain-quadratic
    * blow-up at open-web domain counts. Output is one row per source
    * pair: bounded by catalog size, never corpus size.
    */
  q("dedup_cross_source_overlap",
    """WITH tok AS (SELECT source, str_split(text, ' ') AS tok FROM documents),
      |     g0 AS (
      |  SELECT source, unnest([list_aggr(tok[i:i+7], 'string_agg', ' ')
      |                         FOR i IN range(1, greatest(len(tok) - 7, 1) + 1)]) AS g
      |  FROM tok),
      |     grams AS (SELECT DISTINCT source, g FROM g0),
      |     keep AS (SELECT g FROM grams GROUP BY g
      |              HAVING count(*) BETWEEN 2 AND 16),
      |     kept AS (SELECT g, source FROM grams WHERE g IN (SELECT g FROM keep)),
      |     shared AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
      |  FROM kept a JOIN kept b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2),
      |     tot AS (SELECT source, count(*) AS t FROM grams GROUP BY 1)
      |SELECT src_a, src_b, shared, ta.t AS n_a, tb.t AS n_b,
      |       round(CAST(shared AS DOUBLE) / least(ta.t, tb.t), 6) AS containment
      |FROM shared JOIN tot ta ON ta.source = src_a
      |            JOIN tot tb ON tb.source = src_b
      |ORDER BY src_a, src_b""") { (s, d) =>
    // materialized ONCE (localCheckpoint, the pqEncoded pattern): the
    // distinct gram set feeds FOUR plan arms (totals, df-cap, both
    // self-join sides) — without the checkpoint each arm re-tokenizes
    // the corpus, a 4× scan at 100 TB; with it they share 16 B/row
    val grams = T(s, d, "documents")
      .withColumn("tok", split(col("text"), " "))
      .select(col("source"), explode(expr(
        "transform(sequence(0, greatest(size(tok) - 8, 0)), i -> xxhash64(concat_ws(' ', slice(tok, i + 1, 8))))")).as("g"))
      .distinct()
      .localCheckpoint()
    // df-cap: two-phase count (grams is distinct per (g, source), so
    // count(*) = distinct-source count), filter BEFORE the self-join
    val keep = grams.groupBy("g").agg(count(lit(1)).as("ds"))
      .filter(col("ds").between(2, 16)).select("g")
    val kept = grams.join(keep, Seq("g"))
    val shared = kept.select(col("g"), col("source").as("src_a"))
      .join(kept.select(col("g"), col("source").as("src_b")), Seq("g"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared"))
    val totals = grams.groupBy("source").agg(count(lit(1)).as("t"))
    shared
      .join(broadcast(totals.select(col("source").as("src_a"), col("t").as("n_a"))), Seq("src_a"))
      .join(broadcast(totals.select(col("source").as("src_b"), col("t").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared"), col("n_a"), col("n_b"),
        round(col("shared").cast("double") / least(col("n_a"), col("n_b")), 6)
          .as("containment"))
      .reportSorted("src_a", "src_b") // ≤ C(#sources, 2) rows
  }
}
