package graft.ops

import scala.collection.mutable

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 additions: curation-QA analytics a training-data platform
  * runs ON its own pipeline — agreement between quality gates, drift
  * alarms on the event stream, dataset-composition audits, preference
  * strength fitting, and a deterministic compressibility signal.
  *
  * Every row follows the registry rules (QueryModule scaladoc): total
  * deterministic order, identical aliases both sides, floats rounded
  * identically, integer arithmetic wherever a boundary could ulp-flip,
  * and the dyadic-grid device (WindowOps.dyGrid scaladoc) before any
  * many-to-one double aggregation.
  */
object CurationOps extends QueryModule {

  /** 2⁻²⁰ dyadic-grid snap — the shared [[Grid]] device (see its
    * scaladoc for the exactness argument and the 2³³ magnitude bound):
    * applied to each term before a double sum so the sum is
    * order/tree-shape-exact in IEEE double.
    */
  private def dy20(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Grid.dy20(c)
  private def dy20Sql(x: String): String = Grid.dy20Sql(x)
  private def dy20D(x: Double): Double = Grid.dy20D(x)

  /** Per-doc token/type counts — the shared first stage of the two
    * raters and the Bradley–Terry score. Nonempty whitespace tokens
    * only (both engines filter identically); docs whose token stream
    * is empty keep a row via the left join in each consumer.
    */
  private def docTypeCounts(s: SparkSession, d: String): DataFrame =
    T(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("t"), countDistinct("w").as("types"))

  private val docTypeCountsSql =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |ty AS (SELECT doc_id, count(*) AS t, count(DISTINCT w) AS types
      |       FROM tok WHERE length(w) > 0 GROUP BY doc_id)""".stripMargin

  /** Cohen's κ agreement between two quality gates (SPEC: Cohen 1960 —
    * the standard chance-corrected agreement statistic; curation teams
    * run it between heuristic filters, model classifiers, and human
    * raters before trusting any single gate). Rater A keeps docs with
    * ≥ 50 tokens (a length gate); rater B keeps docs whose type/token
    * ratio is ≥ 1/2 (a diversity gate) — both integer comparisons, so
    * the 2×2 agreement table is exact on both engines and κ is a
    * single rounded rational. Shape at 100 TB: the type counts are one
    * two-phase grouped aggregate over the token stream; the κ
    * arithmetic runs on a 1-row frame. Zero driver state.
    */
  q("dq_cohen_kappa",
    s"""WITH $docTypeCountsSql,
       |f AS (
       |  SELECT d.doc_id,
       |         CASE WHEN coalesce(ty.t, 0) >= 50 THEN 1 ELSE 0 END AS a,
       |         CASE WHEN 2 * coalesce(ty.types, 0) >= coalesce(ty.t, 0)
       |                   AND coalesce(ty.t, 0) > 0 THEN 1 ELSE 0 END AS b
       |  FROM documents d LEFT JOIN ty ON ty.doc_id = d.doc_id),
       |c AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb,
       |         CAST(sum(a * b) AS BIGINT) AS n11,
       |         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
       |  FROM f)
       |SELECT n AS n_docs, na AS n_keep_len, nb AS n_keep_div,
       |       n11 + n00 AS n_agree,
       |       round((n11 + n00) * 1.0 / n, 6) AS po,
       |       round((na * 1.0 / n) * (nb * 1.0 / n)
       |             + ((n - na) * 1.0 / n) * ((n - nb) * 1.0 / n), 6) AS pe,
       |       round(((n11 + n00) * 1.0 / n
       |              - ((na * 1.0 / n) * (nb * 1.0 / n)
       |                 + ((n - na) * 1.0 / n) * ((n - nb) * 1.0 / n)))
       |             / nullif(1 - ((na * 1.0 / n) * (nb * 1.0 / n)
       |                     + ((n - na) * 1.0 / n) * ((n - nb) * 1.0 / n)), 0), 6) AS kappa
       |FROM c""") { (s, d) =>
    val f = T(s, d, "documents").select("doc_id")
      .join(docTypeCounts(s, d), Seq("doc_id"), "left")
      .select(
        when(coalesce(col("t"), lit(0L)) >= 50, 1L).otherwise(0L).as("a"),
        when(lit(2) * coalesce(col("types"), lit(0L)) >= coalesce(col("t"), lit(0L))
          && coalesce(col("t"), lit(0L)) > 0, 1L).otherwise(0L).as("b"))
    val c = f.agg(count(lit(1)).as("n"), sum("a").as("na"), sum("b").as("nb"),
      sum(col("a") * col("b")).as("n11"),
      sum((lit(1) - col("a")) * (lit(1) - col("b"))).as("n00"))
    val po = (col("n11") + col("n00")) * lit(1.0) / col("n")
    val pe = (col("na") * lit(1.0) / col("n")) * (col("nb") * lit(1.0) / col("n")) +
      ((col("n") - col("na")) * lit(1.0) / col("n")) *
        ((col("n") - col("nb")) * lit(1.0) / col("n"))
    // unanimous raters ⇒ pe = 1 exactly: κ is undefined (NULL), and the
    // zero denominator must not trip ANSI DIVIDE_BY_ZERO (checklist 7)
    val kDen = when(pe =!= lit(1.0), lit(1) - pe)
    c.select(col("n").cast("long").as("n_docs"),
      col("na").cast("long").as("n_keep_len"), col("nb").cast("long").as("n_keep_div"),
      (col("n11") + col("n00")).cast("long").as("n_agree"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      round((po - pe) / kDen, 6).as("kappa"))
  }

  /** Krippendorff's α between the same two quality gates as
    * [[dq_cohen_kappa]] (SPEC: Krippendorff 1970/2004 — the
    * reliability coefficient content-analysis methodology standardized
    * on; for complete two-rater nominal data it is κ-adjacent, but its
    * DEFINING property is principled MISSING-DATA handling, which κ
    * has none of). Here the diversity gate genuinely ABSTAINS on
    * empty-token docs (κ forces a 0 vote); units with fewer than two
    * ratings drop from the whole calculation per the α definition.
    * D_o = pairwise disagreement within units; D_e = disagreement
    * expected from the POOLED value marginals (both raters' ratings
    * in one urn — another α-vs-κ distinction: κ uses per-rater
    * marginals); α = 1 − D_o/D_e. Every count is integer; the ratios
    * are formed ratio-first ((n₁/N)·(n₀/(N−1))·2, bounded ~1) so the
    * doubles are the same IEEE expression on both engines at any
    * scale, and D_e = 0 (unanimous pool) yields NULL via nullif
    * (rule 7). Shape at 100 TB: identical to κ — one two-phase
    * grouped aggregate over the token stream, then arithmetic on a
    * 1-row frame.
    */
  q("dq_krippendorff_alpha",
    s"""WITH $docTypeCountsSql,
       |f AS (
       |  SELECT d.doc_id,
       |         CASE WHEN coalesce(ty.t, 0) >= 50 THEN 1 ELSE 0 END AS a,
       |         CASE WHEN coalesce(ty.t, 0) = 0 THEN NULL
       |              WHEN 2 * ty.types >= ty.t THEN 1 ELSE 0 END AS b
       |  FROM documents d LEFT JOIN ty ON ty.doc_id = d.doc_id),
       |p AS (SELECT a, b FROM f WHERE b IS NOT NULL),
       |c AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb,
       |         CAST(sum(a * b) AS BIGINT) AS n11,
       |         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
       |  FROM p),
       |x AS (SELECT n, n - n11 - n00 AS ndis, 2 * n AS nn,
       |             na + nb AS n1, 2 * n - na - nb AS n0
       |      FROM c)
       |SELECT n AS n_units, CAST(ndis AS BIGINT) AS n_disagree,
       |       round(ndis * 1.0 / n, 6) AS d_o,
       |       round((n1 * 1.0 / nn) * (n0 * 1.0 / (nn - 1)) * 2, 6) AS d_e,
       |       round(1 - (ndis * 1.0 / n)
       |             / nullif((n1 * 1.0 / nn) * (n0 * 1.0 / (nn - 1)) * 2, 0), 6) AS alpha
       |FROM x""") { (s, d) =>
    val f = T(s, d, "documents").select("doc_id")
      .join(docTypeCounts(s, d), Seq("doc_id"), "left")
      .select(
        when(coalesce(col("t"), lit(0L)) >= 50, 1L).otherwise(0L).as("a"),
        when(coalesce(col("t"), lit(0L)) === 0, lit(null).cast("long"))
          .when(lit(2) * col("types") >= col("t"), 1L).otherwise(0L).as("b"))
      .filter(col("b").isNotNull)
    val c = f.agg(count(lit(1)).as("n"), sum("a").as("na"), sum("b").as("nb"),
      sum(col("a") * col("b")).as("n11"),
      sum((lit(1) - col("a")) * (lit(1) - col("b"))).as("n00"))
    val x = c.select(col("n"), (col("n") - col("n11") - col("n00")).as("ndis"),
      (lit(2) * col("n")).as("nn"),
      (col("na") + col("nb")).as("n1"),
      (lit(2) * col("n") - col("na") - col("nb")).as("n0"))
    val dE = (col("n1") * lit(1.0) / col("nn")) *
      (col("n0") * lit(1.0) / (col("nn") - 1)) * lit(2)
    x.select(col("n").cast("long").as("n_units"),
      col("ndis").cast("long").as("n_disagree"),
      round(col("ndis") * lit(1.0) / col("n"), 6).as("d_o"),
      round(dE, 6).as("d_e"),
      round(lit(1) - (col("ndis") * lit(1.0) / col("n")) / nullif(dE, lit(0.0)), 6)
        .as("alpha"))
  }

  /** One-sided Page CUSUM drift alarm per user (SPEC: Page 1954 — the
    * sequential detection statistic s_t = max(0, s_{t-1} + x_t − k);
    * [[ts_cusum_changepoint]] in WindowOps is the RETROSPECTIVE
    * changepoint variant, this is the streaming-alarm one). The naive
    * form is a nonlinear per-row recurrence; the scalable form is the
    * reflection identity s_t = S_t − min(0, min_{j≤t} S_j) with
    * S = prefix sum of (x − k), which turns the whole fold into TWO
    * cumulative windows over the user's natural partition — no
    * mapGroups, no per-group memory, works on an unbounded group.
    * Everything is INTEGER CENTS (events.value carries exactly 2
    * decimals): the reference k is the floor of the global mean in
    * cents, so prefix sums, running minima, and the alarm comparison
    * are exact at any accumulation order and any scale. One double
    * appears, in the final display division by 100. Alarm threshold
    * h = 250.00 (25000 cents) of cumulative above-mean excess.
    */
  q("ts_page_cusum",
    """WITH k AS (
      |  SELECT CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT)
      |         AS kc FROM events),
      |p AS (
      |  SELECT user_id, event_id,
      |         row_number() OVER uw AS rn,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT) - k.kc) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ps
      |  FROM events, k
      |  WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |c AS (
      |  SELECT user_id, event_id, rn,
      |         ps - least(0, min(ps) OVER (PARTITION BY user_id ORDER BY rn
      |                ROWS UNBOUNDED PRECEDING)) AS stat
      |  FROM p)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(max(stat) AS DOUBLE) / 100 AS cusum_max,
      |       CAST(count(*) FILTER (WHERE stat >= 25000) AS BIGINT) AS n_alarms,
      |       min_by(event_id, rn) FILTER (WHERE stat >= 25000) AS first_alarm_event
      |FROM c GROUP BY user_id ORDER BY user_id""") { (s, d) =>
    val e = T(s, d, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    // exact integral floor division (a double divide + cast could ulp-flip)
    val k = e.agg(expr("sum(cents) div count(1)").as("kc"))
    val wu = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val wc = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = e.crossJoin(broadcast(k))
      .withColumn("rn", row_number().over(wu))
      .withColumn("ps", sum(col("cents") - col("kc")).over(wc))
      .withColumn("runmin", min(col("ps")).over(wc))
      .withColumn("stat", col("ps") - least(lit(0L), col("runmin")))
    st.groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        (max("stat").cast("double") / lit(100)).as("cusum_max"),
        expr("count(1) FILTER (WHERE stat >= 25000)").cast("long").as("n_alarms"),
        expr("min_by(event_id, rn) FILTER (WHERE stat >= 25000)").as("first_alarm_event"))
      .orderBy("user_id") // one row per user = input-sized
  }

  /** Mutual information between lang and source (SPEC: Cover & Thomas
    * ch.2 — the dataset-composition audit: high MI means language is
    * predictable from source, i.e. the mixture is NOT exchangeable and
    * per-source sampling will skew language balance). The contingency
    * table is one grouped count (≤ |langs|·|sources| cells — catalog-
    * bounded); marginals re-aggregate the CELL frame, never the input.
    * Each p·ln term is dyadic-grid-snapped before the cell sum, so the
    * only cross-engine risk is the documented ~1e-9 grid-boundary
    * straddle of the ln ulp (LlmOps quantization scaladoc), not
    * accumulation order. NMI = MI / sqrt(H_lang · H_source).
    */
  q("dq_mutual_information",
    s"""WITH cells AS (
       |  SELECT lang, source, count(*) AS c FROM documents GROUP BY lang, source),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
       |ml AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM cells GROUP BY lang),
       |ms AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM cells GROUP BY source),
       |mi AS (
       |  SELECT sum(${dy20Sql(
             "(ce.c * 1.0 / t.n) * ln((ce.c * 1.0 * t.n) / (ml.cl * 1.0 * ms.cs))")}) AS mi
       |  FROM cells ce JOIN ml USING (lang) JOIN ms USING (source), tot t),
       |hl AS (SELECT -sum(${dy20Sql(
             "(cl * 1.0 / t.n) * ln(cl * 1.0 / t.n)")}) AS h FROM ml, tot t),
       |hs AS (SELECT -sum(${dy20Sql(
             "(cs * 1.0 / t.n) * ln(cs * 1.0 / t.n)")}) AS h FROM ms, tot t)
       |SELECT t.n AS n_docs, round(mi.mi, 6) AS mi_nats,
       |       round(hl.h, 6) AS h_lang, round(hs.h, 6) AS h_source,
       |       round(mi.mi / nullif(sqrt(hl.h * hs.h), 0), 6) AS nmi
       |FROM tot t, mi, hl, hs""") { (s, d) =>
    val cells = T(s, d, "documents").groupBy("lang", "source")
      .agg(count(lit(1)).as("c"))
    val tot = cells.agg(sum("c").cast("long").as("n"))
    val ml = cells.groupBy("lang").agg(sum("c").cast("long").as("cl"))
    val ms = cells.groupBy("source").agg(sum("c").cast("long").as("cs"))
    // ml/ms are cell-frame aggregates (bounded by |langs|·|sources| but
    // data-dependent at open-web scale) — rule 11: AQE size-gates them;
    // only the 1-row frames are pinned broadcast.
    val mi = cells.join(ml, "lang").join(ms, "source")
      .crossJoin(broadcast(tot))
      .agg(sum(dy20((col("c") * lit(1.0) / col("n")) *
        log((col("c") * lit(1.0) * col("n")) / (col("cl") * lit(1.0) * col("cs"))))).as("mi"))
    val hl = ml.crossJoin(broadcast(tot))
      .agg((-sum(dy20((col("cl") * lit(1.0) / col("n")) *
        log(col("cl") * lit(1.0) / col("n"))))).as("hl"))
    val hs = ms.crossJoin(broadcast(tot))
      .agg((-sum(dy20((col("cs") * lit(1.0) / col("n")) *
        log(col("cs") * lit(1.0) / col("n"))))).as("hs"))
    // a monolingual (or single-source) corpus has a zero entropy ⇒ NMI
    // undefined (NULL), guarded against ANSI DIVIDE_BY_ZERO (checklist 7)
    val nmiDen = sqrt(col("hl") * col("hs"))
    tot.crossJoin(broadcast(mi)).crossJoin(broadcast(hl)).crossJoin(broadcast(hs))
      .select(col("n").as("n_docs"), round(col("mi"), 6).as("mi_nats"),
        round(col("hl"), 6).as("h_lang"), round(col("hs"), 6).as("h_source"),
        round(col("mi") / when(nmiDen =!= 0.0, nmiDen), 6).as("nmi"))
  }

  /** Bradley–Terry MM iterations for the source-strength fit. */
  private val BtIters = 5

  /** Bradley–Terry source-strength fit (SPEC: Bradley & Terry 1952;
    * MM algorithm per Hunter 2004 — the model behind every preference
    * leaderboard: given pairwise wins, fit strengths π with
    * P(i beats j) = π_i/(π_i+π_j)). "Matches" are lang-stratified doc
    * pairs from different sources, won by the higher type/token-ratio
    * bucket (integer b = 20·types div tokens — exact both engines;
    * equal buckets = tie = no match, standard BT). The wins matrix is
    * NEVER built per-pair: per-(lang, source, bucket) counts (one
    * corpus pass) meet a densified per-bucket cumulative grid, so
    * W[a,b] = Σ cnt_a·below_b costs |sources|²·|langs|·21 — the
    * quadratic lives at SOURCE granularity, documents are touched
    * once. CONTRACT: the player set is catalog-sized (source lists,
    * model arenas — ≤ ~10⁴); the S² wins matrix is bounded driver
    * state (the k-means-centroid pattern) and the MM loop runs on it
    * driver-side with every term and every normalized π snapped to
    * the 2⁻²⁰ dyadic grid — the oracle replays the SAME {@link
    * BtIters} iterations as chained CTEs over the SQL-rebuilt matrix,
    * so the hash proves the fit end-to-end, not just the matrix.
    */
  q("pref_bradley_terry", {
    // AS MATERIALIZED on every multiply-referenced stage: this DuckDB
    // inlines CTE references by default, and the iteration chain
    // references it{k-1} twice — inlining re-expands the entire
    // matrix pipeline 2^T times (the first cut died on file handles).
    // Scalar subqueries are avoided for the same reason (gt/ns/z$k
    // are joined 1-row frames, never correlated).
    val matrixSql =
      s"""WITH
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |ty AS MATERIALIZED (
         |  SELECT doc_id, count(*) AS t, count(DISTINCT w) AS types
         |  FROM tok WHERE length(w) > 0 GROUP BY doc_id),
         |sc AS (
         |  SELECT d.lang, d.source, 20 * ty.types // ty.t AS b
         |  FROM documents d JOIN ty ON ty.doc_id = d.doc_id),
         |cnt AS MATERIALIZED (
         |  SELECT lang, source, b, count(*) AS c FROM sc GROUP BY lang, source, b),
         |grid AS (
         |  SELECT s.source, l.lang, gb.b
         |  FROM (SELECT DISTINCT source FROM documents) s,
         |       (SELECT DISTINCT lang FROM documents) l,
         |       unnest(generate_series(0, 20)) gb(b)),
         |cum AS (
         |  SELECT g.source, g.lang, g.b,
         |         sum(coalesce(c.c, 0)) OVER (PARTITION BY g.source, g.lang
         |           ORDER BY g.b ROWS UNBOUNDED PRECEDING) - coalesce(c.c, 0) AS below
         |  FROM grid g LEFT JOIN cnt c
         |    ON c.source = g.source AND c.lang = g.lang AND c.b = g.b),
         |wins AS MATERIALIZED (
         |  SELECT a.source AS sa, w.source AS sb, CAST(sum(a.c * w.below) AS BIGINT) AS w
         |  FROM cnt a JOIN cum w ON w.lang = a.lang AND w.b = a.b AND w.source <> a.source
         |  GROUP BY a.source, w.source),
         |games AS MATERIALIZED (
         |  SELECT coalesce(x.sa, y.sb) AS sa, coalesce(x.sb, y.sa) AS sb,
         |         coalesce(x.w, 0) + coalesce(y.w, 0) AS n
         |  FROM wins x FULL OUTER JOIN wins y ON y.sa = x.sb AND y.sb = x.sa),
         |gt AS (SELECT sa AS source, CAST(sum(n) AS BIGINT) AS games
         |       FROM games GROUP BY sa),
         |wt AS MATERIALIZED (
         |  SELECT s.source, CAST(coalesce(sum(w.w), 0) AS BIGINT) AS wtot
         |  FROM (SELECT DISTINCT source FROM documents) s
         |  LEFT JOIN wins w ON w.sa = s.source GROUP BY s.source),
         |ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM wt),
         |it0 AS MATERIALIZED (SELECT w.source, 1.0 / ns.s AS pi FROM wt w, ns)""".stripMargin
    // Match counts are PRESCALED by 2¹³ (exact: power-of-two division)
    // before the grid snap: den terms scale ~quadratically with corpus
    // size, and grid-multiple sums are only order-exact while the total
    // stays under 2³³ (Grid scaladoc) — the prescale buys that bound
    // ~10⁴× of headroom (≈10¹² total matches at balanced strengths)
    // without touching the fit (MM is invariant to scaling n and W by
    // the same constant). π is floored at one grid step after each
    // normalization: a hopeless source's π would otherwise snap to
    // exactly 0.0, and a game between two zero-π sources divides by
    // zero — Infinity driver-side but NULL in DuckDB, a cross-engine
    // fork. The floor never binds above π ≈ 10⁻⁶ (strengths here are
    // ~1/S with S catalog-sized).
    val iters = (1 to BtIters).map { k =>
      s"""d$k AS (
         |  SELECT g.sa AS source,
         |         sum(${dy20Sql(s"(g.n / 8192.0) / (pa.pi + pb.pi)")}) AS den
         |  FROM games g JOIN it${k - 1} pa ON pa.source = g.sa
         |               JOIN it${k - 1} pb ON pb.source = g.sb
         |  WHERE g.n > 0 GROUP BY g.sa),
         |r$k AS MATERIALIZED (
         |  SELECT w.source, ${dy20Sql("(w.wtot / 8192.0) / d.den")} AS praw
         |  FROM wt w JOIN d$k d ON d.source = w.source),
         |z$k AS (SELECT sum(praw) AS z FROM r$k),
         |it$k AS MATERIALIZED (
         |  SELECT r.source, greatest(${dy20Sql("r.praw / z.z")}, 1.0 / 1048576.0) AS pi
         |  FROM r$k r, z$k z)""".stripMargin
    }.mkString(",\n", ",\n", "")
    matrixSql + iters +
      s"""
         |SELECT w.source, w.wtot AS wins, coalesce(g.games, 0) AS games,
         |       round(i.pi, 6) AS strength,
         |       CAST(row_number() OVER (ORDER BY round(i.pi, 6) DESC, w.source)
         |            AS BIGINT) AS rank
         |FROM wt w JOIN it$BtIters i ON i.source = w.source
         |LEFT JOIN gt g ON g.source = w.source
         |ORDER BY rank""".stripMargin
  }) { (s, d) =>
    // --- distributed wins-matrix build (documents touched ONCE) ---
    val sc0 = T(s, d, "documents").select("doc_id", "lang", "source")
      .join(docTypeCounts(s, d), Seq("doc_id"))
      .select(col("lang"), col("source"), expr("20 * types div t").as("b"))
    val cnt = sc0.groupBy("lang", "source", "b").agg(count(lit(1)).as("c"))
    val docs = T(s, d, "documents")
    val grid = docs.select("source").distinct()
      .crossJoin(docs.select("lang").distinct())
      .withColumn("b", explode(sequence(lit(0), lit(20))))
    val wcum = Window.partitionBy("source", "lang").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.join(cnt, Seq("source", "lang", "b"), "left")
      .withColumn("below", sum(coalesce(col("c"), lit(0L))).over(wcum) -
        coalesce(col("c"), lit(0L)))
      .select(col("source"), col("lang"), col("b"), col("below"))
    val wins = cnt.as("a")
      .join(cum.as("w"), col("w.lang") === col("a.lang") &&
        col("w.b") === col("a.b") && col("w.source") =!= col("a.source"))
      .select(col("a.source").as("sa"), col("w.source").as("sb"),
        (col("a.c") * col("w.below")).as("x"))
      .groupBy("sa", "sb")
      .agg(sum("x").cast("long").as("w"))
    // --- bounded driver state: the S² wins matrix (S = |sources|) ---
    val wMap = wins.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    val games = (for {
      a <- sources; b <- sources if a < b
      n = wMap.getOrElse((a, b), 0L) + wMap.getOrElse((b, a), 0L) if n > 0
    } yield (a, b, n)).toSeq
    val wTot = sources.map(src =>
      src -> sources.map(o => wMap.getOrElse((src, o), 0L)).sum).toMap
    val gTot = {
      // One O(|games|) pass (like the MM `den` loop below) — a per-source
      // rescan of the pair list would be O(S·|games|) = O(S³) driver time
      // at the contract's S≈10⁴ bound.
      val acc = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
      games.foreach { case (a, b, n) => acc(a) += n; acc(b) += n }
      sources.map(src => src -> acc(src)).toMap
    }
    // A source with zero games has an empty MM denominator; the oracle's
    // inner joins drop it from every iteration, so mirror that here —
    // it keeps its π₀ share of nothing and is excluded from the output.
    val active = sources.filter(src => gTot(src) > 0)
    // --- MM iterations (Hunter 2004), every term + π grid-snapped;
    // counts prescaled by 2¹³ and π floored at one grid step — see the
    // oracle comment above for why both are load-bearing ---
    var pi = sources.map(_ -> 1.0 / sources.length).toMap
    for (_ <- 1 to BtIters) {
      val den = mutable.HashMap.empty[String, Double].withDefaultValue(0.0)
      games.foreach { case (a, b, n) =>
        den(a) += dy20D((n / 8192.0) / (pi(a) + pi(b)))
        den(b) += dy20D((n / 8192.0) / (pi(a) + pi(b)))
      }
      val praw = active.map(src => src -> dy20D((wTot(src) / 8192.0) / den(src))).toMap
      val z = active.map(praw).sum // grid multiples: order-exact
      pi = active.map(src => src -> math.max(dy20D(praw(src) / z), Grid.Dy20Step)).toMap
    }
    // Final rounding and ranking go through Spark's round()/row_number so
    // the boundary semantics are the same proven pair every other row
    // uses (driver-side math.rint is HALF_EVEN — a dy20 grid point CAN
    // sit exactly on a 1e-6 half boundary, e.g. π = m/128).
    val raw = s.createDataFrame(
      s.sparkContext.parallelize(
        active.map(src => Row(src, wTot(src), gTot(src), pi(src))).toList, 1),
      StructType(Seq(
        StructField("source", StringType), StructField("wins", LongType),
        StructField("games", LongType), StructField("pi", DoubleType))))
    raw.withColumn("strength", round(col("pi"), 6))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("strength").desc, col("source").asc))
          .cast("long"))
      .select("source", "wins", "games", "strength", "rank")
      .orderBy("rank")
  }

  /** LZ78 phrase budget for the complexity scan: well above any doc's
    * phrase count at 240 chars, just a loop guard.
    */
  private val LzPrefixCps = 240

  /** LZ78 parse of the first [[LzPrefixCps]] CODE POINTS: returns the
    * number of phrases. Dictionary is prefix-closed by construction
    * (every phrase extends an existing one by one char), so longest-
    * match probing extends one char at a time against a hash set. The
    * final phrase may be an incomplete repeat of a dictionary entry
    * (input exhausted mid-match) — it still counts, the standard LZ78
    * convention, mirrored by the oracle CTE's tail case.
    */
  private[ops] def lz78Phrases(text: String): (Int, Int) = {
    if (text == null || text.isEmpty) return (0, 0)
    val cpsAll = text.codePoints().toArray
    val cps = cpsAll.take(LzPrefixCps)
    def slice(from: Int, until: Int): String =
      new String(cps, from, until - from)
    val dict = mutable.HashSet.empty[String]
    var pos = 0
    var n = 0
    while (pos < cps.length) {
      var end = pos + 1
      while (end <= cps.length && dict.contains(slice(pos, end))) end += 1
      if (end <= cps.length) { // extension char exists: new phrase
        dict += slice(pos, end)
        pos = end
      } else pos = cps.length // incomplete tail phrase: count, no entry
      n += 1
    }
    (cps.length, n)
  }

  /** Lempel–Ziv (LZ78) complexity per doc (SPEC: Ziv & Lempel 1978;
    * LZ complexity as a repetitiveness measure per Lempel & Ziv 1976 —
    * the DETERMINISTIC companion to [[LlmOps]]'s zlib
    * `text_compression_ratio`: same quality signal family
    * (templated/boilerplate text parses into few phrases, diverse text
    * into many), but the parse rule is a published algorithm both
    * engines can replay exactly, so THIS row is hash-checked where
    * zlib's encoder output cannot be. Bounded to the first 240 code
    * points per doc (complexity saturates long before that; the bound
    * also caps the oracle recursion). Shape: doc-level map — the
    * per-doc scan is inherently sequential (each phrase depends on the
    * dictionary so far), document parallelism is the honest grain;
    * zero shuffle before the output sort. Oracle: recursive CTE, one
    * phrase per recursion step, longest-match via list comprehension
    * over the (prefix-closed) dictionary carried as list state.
    */
  q("text_lz_complexity",
    s"""WITH RECURSIVE
       |dd AS (SELECT doc_id, substr(coalesce(text, ''), 1, $LzPrefixCps) AS s
       |       FROM documents),
       |enc(doc_id, pos, dict, n) AS (
       |  SELECT doc_id, 1, CAST([] AS VARCHAR[]), 0 FROM dd
       |  UNION ALL
       |  SELECT e.doc_id,
       |         CASE WHEN e.pos + b.bl <= length(d.s)
       |              THEN e.pos + b.bl + 1 ELSE length(d.s) + 1 END,
       |         CASE WHEN e.pos + b.bl <= length(d.s)
       |              THEN list_append(e.dict, substr(d.s, e.pos, b.bl + 1))
       |              ELSE e.dict END,
       |         e.n + 1
       |  FROM enc e JOIN dd d USING (doc_id),
       |       LATERAL (SELECT coalesce(list_max([length(w) FOR w IN e.dict
       |                  IF w = substr(d.s, e.pos, length(w))]), 0) AS bl) b
       |  WHERE e.pos <= length(d.s)),
       |fin AS (SELECT doc_id, max(n) AS n_phrases FROM enc GROUP BY doc_id)
       |SELECT d.doc_id, CAST(length(dd.s) AS BIGINT) AS n_chars,
       |       CAST(f.n_phrases AS INTEGER) AS n_phrases,
       |       CASE WHEN length(dd.s) = 0 THEN CAST(0.0 AS DOUBLE)
       |            ELSE round(f.n_phrases * 1.0 / length(dd.s), 6) END AS lz_ratio
       |FROM documents d JOIN dd USING (doc_id) JOIN fin f USING (doc_id)
       |ORDER BY d.doc_id""") { (s, d) =>
    // native Lz78Stats expression (functions/TextExpressions.scala):
    // map-side inside whole-stage codegen, no Encoder in the plan —
    // the prior Dataset.map formulation deserialized every row through
    // a tuple encoder (the suite's only typed hot path, r11 verdict)
    T(s, d, "documents")
      .select(col("doc_id"),
        graft.functions.text.lz78Stats(coalesce(col("text"), lit("")), LzPrefixCps).as("st"))
      .select(col("doc_id"),
        col("st").getItem(0).cast("long").as("n_chars"),
        col("st").getItem(1).as("n_phrases"))
      // ratio rounded by Spark's round() (not driver math) so the
      // boundary semantics are the proven round()/round() engine pair
      .withColumn("lz_ratio",
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(round(col("n_phrases") * lit(1.0) / col("n_chars"), 6)))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** URL canonicalization dedup (r14 — the CommonCrawl/WARC ingest
    * step BEFORE any content dedup: the same page arrives as scheme/
    * host-case variants, www-prefixed, default-ported, utm-tagged,
    * fragment-suffixed, and trailing-slashed duplicates; canonical-URL
    * grouping removes them for free, no content ever read). Each doc
    * synthesizes its crawl URL from a closed form of (doc_id, source)
    * with doc_id-driven decorations — each run of 7 doc_ids shares one LOGICAL url —
    * and the canonicalizer must collapse exactly those groups:
    * lowercase scheme+host, strip the scheme's default port and the
    * `www.` prefix, drop utm_* query params (keeping and sorting the
    * rest), drop the fragment, strip the trailing slash. BOTH engines
    * implement the canonicalizer independently from the spec above
    * (split/lower/filter ops — no shared code), so a rule drifting on
    * either side reds the hash. Scale: map-side canonicalization +
    * ONE group count — the shape of a 10¹¹-URL frontier dedup.
    */
  q("dedup_url_canonical",
    """WITH u AS (
      |  SELECT doc_id, source,
      |         (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'https'
      |               ELSE 'Https' END) || '://' ||
      |         (CASE doc_id % 4 WHEN 0 THEN 'WWW.Crawl.Example.COM:443'
      |               WHEN 1 THEN 'www.crawl.example.com'
      |               WHEN 2 THEN 'crawl.example.com:443'
      |               ELSE 'Crawl.Example.Com' END) ||
      |         '/docs/' || CAST(doc_id // 7 AS VARCHAR) ||
      |         (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
      |         (CASE WHEN doc_id % 5 = 0
      |               THEN '?utm_source=feed&id=7&utm_campaign=x'
      |               ELSE '?id=7' END) ||
      |         (CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END)
      |           AS raw_url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, raw_url,
      |         -- canonicalize: the same rules, DuckDB-side
      |         lower(string_split(string_split(raw_url, '#')[1], '://')[1]) ||
      |         '://' ||
      |         regexp_replace(regexp_replace(lower(
      |             string_split(string_split(string_split(raw_url, '#')[1],
      |               '://')[2], '/')[1]), '^www\.', ''), ':443$', '') ||
      |         (CASE WHEN rtrim(pathpart, '/') = '' THEN ''
      |               ELSE rtrim(pathpart, '/') END) ||
      |         (CASE WHEN qkeep = '' THEN '' ELSE '?' || qkeep END)
      |           AS canonical_url
      |  FROM (
      |    SELECT doc_id, source, raw_url,
      |           '/' || array_to_string(string_split(string_split(
      |             string_split(string_split(raw_url, '#')[1], '://')[2],
      |             '?')[1], '/')[2:], '/') AS pathpart,
      |           array_to_string(list_sort([p FOR p IN string_split(
      |             coalesce(string_split(string_split(raw_url, '#')[1],
      |               '?')[2], ''), '&') IF p <> '' AND p NOT LIKE 'utm_%']),
      |             '&') AS qkeep
      |    FROM u) t)
      |SELECT c.doc_id, c.canonical_url,
      |       CAST(g.n AS BIGINT) AS n_variants,
      |       c.doc_id = g.keeper AS keep
      |FROM c JOIN (SELECT canonical_url, count(*) AS n, min(doc_id) AS keeper
      |             FROM c GROUP BY 1) g
      |  ON g.canonical_url = c.canonical_url
      |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
    val raw = T(s, d, "documents").select(col("doc_id"), col("source"))
      .withColumn("raw_url",
        concat(
          when(col("doc_id") % 3 === 0, lit("HTTPS"))
            .when(col("doc_id") % 3 === 1, lit("https")).otherwise(lit("Https")),
          lit("://"),
          when(col("doc_id") % 4 === 0, lit("WWW.Crawl.Example.COM:443"))
            .when(col("doc_id") % 4 === 1, lit("www.crawl.example.com"))
            .when(col("doc_id") % 4 === 2, lit("crawl.example.com:443"))
            .otherwise(lit("Crawl.Example.Com")),
          lit("/docs/"), (col("doc_id") / 7).cast("long").cast("string"),
          when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit("?utm_source=feed&id=7&utm_campaign=x")).otherwise(lit("?id=7")),
          when(col("doc_id") % 6 === 0, lit("#section-2")).otherwise(lit(""))))
    // canonicalize — independent Spark implementation of the same rules
    val noFrag = split(col("raw_url"), "#").getItem(0)
    val scheme = lower(split(noFrag, "://").getItem(0))
    val rest = split(noFrag, "://").getItem(1)
    val hostPort = split(rest, "/").getItem(0)
    val host = regexp_replace(regexp_replace(lower(hostPort), "^www\\.", ""),
      ":443$", "")
    val pathQ = expr("substring(rest, length(hostPort) + 1)")
    val path = split(col("pathQ"), "\\?").getItem(0)
    val qs = split(col("pathQ"), "\\?").getItem(1)
    val qKeep = array_join(array_sort(filter(split(coalesce(col("qs"), lit("")), "&"),
      p => p =!= "" && !p.startsWith("utm_"))), "&")
    val canon = raw
      .withColumn("rest", rest).withColumn("hostPort", hostPort)
      .withColumn("pathQ", pathQ)
      .withColumn("qs", qs)
      .withColumn("canonical_url", concat(
        scheme, lit("://"), host,
        when(regexp_replace(path, "/+$", "") === "", lit(""))
          .otherwise(regexp_replace(path, "/+$", "")),
        when(qKeep === "", lit("")).otherwise(concat(lit("?"), qKeep))))
      .select("doc_id", "canonical_url")
    val groups = canon.groupBy("canonical_url")
      .agg(count(lit(1)).cast("long").as("n_variants"),
        min("doc_id").as("keeper"))
    canon.join(groups, Seq("canonical_url"))
      .select(col("doc_id"), col("canonical_url"), col("n_variants"),
        (col("doc_id") === col("keeper")).as("keep"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** Compute-optimal data allocation (r14 — Hoffmann et al. 2022
    * "Training Compute-Optimal Large Language Models", the Chinchilla
    * rule made executable over the REAL corpus: for a grid of FLOP
    * budgets, the ~20-tokens-per-parameter optimum N = √(C/120),
    * D = 20·N, and whether THIS corpus (per-source whitespace token
    * counts) covers D — the epochs-needed number every data-scaling
    * conversation starts from). The pipeline_minhash_band_tuning
    * pattern: plan-time math over one distributed aggregate.
    * Exactness: N floors to BIGINT off a correctly-rounded sqrt of a
    * LITERAL (engine-identical by IEEE), D = 20·N stays integer, and
    * the one data-dependent ratio rounds to 6dp.
    */
  q("pipeline_chinchilla_allocation",
    """WITH ct AS (
      |  SELECT source, CAST(sum(len([x FOR x IN string_split(
      |           coalesce(text, ''), ' ') IF x <> ''])) AS BIGINT) AS corpus_tokens
      |  FROM documents GROUP BY 1),
      |grid AS (SELECT unnest([1e18, 1e19, 1e20, 1e21]) AS c)
      |SELECT ct.source, ct.corpus_tokens,
      |       CAST(grid.c AS DOUBLE) AS budget_flops,
      |       CAST(floor(sqrt(grid.c / 120)) AS BIGINT) AS n_params,
      |       CAST(20 * floor(sqrt(grid.c / 120)) AS BIGINT) AS d_tokens,
      |       round(20 * floor(sqrt(grid.c / 120)) / ct.corpus_tokens, 6)
      |         AS epochs_needed
      |FROM ct, grid ORDER BY source, budget_flops""".stripMargin) { (s, d) =>
    val ct = T(s, d, "documents")
      .select(col("source"),
        size(filter(split(coalesce(col("text"), lit("")), " "),
          x => x =!= "")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").cast("long").as("corpus_tokens"))
    val grid = s.range(0, 4).select(
      pow(lit(10.0), col("id").cast("double") + lit(18.0)).as("c"))
    ct.crossJoin(broadcast(grid))
      .select(col("source"), col("corpus_tokens"),
        col("c").cast("double").as("budget_flops"),
        floor(sqrt(col("c") / 120)).cast("long").as("n_params"),
        (lit(20L) * floor(sqrt(col("c") / 120)).cast("long")).as("d_tokens"),
        round(lit(20L) * floor(sqrt(col("c") / 120))
          / col("corpus_tokens"), 6).as("epochs_needed"))
      .reportSorted(col("source"), col("budget_flops"))
  }

  /** Paragraph-level (line-level) cross-corpus dedup — the C4 device
    * (Raffel et al. 2020 §2.2: "we discarded all but one of any
    * three-sentence span occurring more than once"; RefinedWeb and
    * FineWeb run the same pass at line granularity): documents split
    * into consecutive 10-token lines, every line that appeared EARLIER
    * in the corpus (strictly smaller (doc_id, line_idx)) is dropped,
    * and each doc reassembles from its surviving lines in order — so
    * boilerplate shared across pages vanishes while each doc's first
    * occurrence survives. This is the granularity BETWEEN dedup_exact
    * (whole doc) and dedup_substring (any window); unlike either, the
    * output is a REWRITTEN corpus, not a keep/drop verdict.
    *
    * Scale: the keeper rule is min(doc_id·2²⁰ + idx) per line — ONE
    * two-phase agg on the line hash (partial min map-side, so a
    * boilerplate line occurring 10⁹ times ships one row per task —
    * the skew-safe form of the textbook row_number()=1 window, which
    * would funnel the hot line through one task) + one join back.
    * Reassembly is a per-doc sort of ≤ lines(doc) surviving structs —
    * bounded by doc length, never corpus-sized. idx < 2²⁰ is enforced
    * loudly (docs cap at ~10⁷ tokens; longer docs chunk upstream).
    */
  q("dedup_paragraph",
    """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks,
      |                  len(str_split(text, ' ')) AS n FROM documents),
      |g AS (SELECT doc_id, toks, n,
      |             unnest(generate_series(0, n - 1, 10)) AS st FROM t),
      |ln AS (SELECT doc_id, st // 10 AS idx,
      |              array_to_string(list_slice(toks, st + 1, least(st + 10, n)), ' ') AS line
      |       FROM g),
      |k AS (SELECT line, min(doc_id * 1048576 + idx) AS keeper
      |      FROM ln GROUP BY line),
      |j AS (SELECT ln.doc_id, ln.idx, ln.line,
      |             CASE WHEN ln.doc_id * 1048576 + ln.idx = k.keeper
      |                  THEN 1 ELSE 0 END AS kept
      |      FROM ln JOIN k USING (line))
      |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_lines,
      |       CAST(sum(kept) AS INTEGER) AS n_kept,
      |       coalesce(string_agg(CASE WHEN kept = 1 THEN line END, ' '
      |                           ORDER BY idx), '') AS text_kept
      |FROM j GROUP BY doc_id ORDER BY doc_id""") { (s, d) =>
    dedupParagraphs(T(s, d, "documents"))
      .orderBy("doc_id") // one row per doc = input-sized
  }

  /** The paragraph-dedup body over any (doc_id, text) frame. */
  private[ops] def dedupParagraphs(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ln = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("st", explode(sequence(lit(0), col("n") - 1, lit(10))))
      .select(col("doc_id"), (col("st") / 10).cast("long").as("idx"),
        array_join(slice(col("toks"), col("st") + 1, lit(10)), " ").as("line"))
    // the keeper key packs (doc_id, idx) into one BIGINT; idx ≥ 2²⁰
    // would corrupt the order, so it fails loudly instead
    val guarded = ln.withColumn("idx",
      when(col("idx") < (1L << 20), col("idx"))
        .otherwise(raise_error(concat(lit("dedup_paragraph: doc "),
          col("doc_id"), lit(" exceeds 2^20 lines")))))
    val keepers = guarded
      .groupBy("line")
      .agg(min(col("doc_id") * lit(1048576L) + col("idx")).as("keeper"))
    guarded.join(keepers, Seq("line"))
      .withColumn("kept",
        when(col("doc_id") * lit(1048576L) + col("idx") === col("keeper"), 1)
          .otherwise(0))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_lines"),
        sum("kept").cast("int").as("n_kept"),
        coalesce(
          array_join(transform(array_sort(collect_list(
            when(col("kept") === 1, struct(col("idx"), col("line"))))),
            x => x.getField("line")), " "),
          lit("")).as("text_kept"))
  }
}
