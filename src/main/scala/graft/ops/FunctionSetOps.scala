package graft.ops

import graft.{QueryModule, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

/** SURVEY.md §2.G (set operations), §2.H (scalar functions),
  * §2.I (reshape/densify).
  *
  * The GDX-flavored ops (set algebra over label sets, densify's sparse→
  * dense grid with default fill, sparsify's default-record drop) are
  * expressed over the harness star schema; the same functions back the
  * symbol-level API in graft.gdx.
  */
object FunctionSetOps extends QueryModule {

  // ---------------------------------------------------------------- G

  private val custNations =
    "SELECT DISTINCT n.n_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey"
  private val suppNations =
    "SELECT DISTINCT n.n_name FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey"

  private def nationsOf(s: org.apache.spark.sql.SparkSession, d: String,
      tbl: String, key: String) =
    T(s, d, tbl)
      .join(broadcast(T(s, d, "nation")), col(key) === col("n_nationkey"))
      .select("n_name").distinct()

  q("set_union",
    s"SELECT n_name FROM (($custNations) UNION ($suppNations)) t ORDER BY n_name") { (s, d) =>
    nationsOf(s, d, "customer", "c_nationkey")
      .union(nationsOf(s, d, "supplier", "s_nationkey"))
      .distinct()
      .reportSorted("n_name")
  }

  q("set_intersect",
    s"SELECT n_name FROM (($custNations) INTERSECT ($suppNations)) t ORDER BY n_name") { (s, d) =>
    nationsOf(s, d, "customer", "c_nationkey")
      .intersect(nationsOf(s, d, "supplier", "s_nationkey"))
      .reportSorted("n_name")
  }

  q("set_except",
    s"SELECT n_name FROM (($custNations) EXCEPT ($suppNations)) t ORDER BY n_name") { (s, d) =>
    nationsOf(s, d, "customer", "c_nationkey")
      .except(nationsOf(s, d, "supplier", "s_nationkey"))
      .reportSorted("n_name")
  }

  q("union_all_multifile",
    """SELECT src, count(*) AS n FROM (
      |  SELECT 'f1' AS src FROM lineitem UNION ALL SELECT 'f2' AS src FROM lineitem) t
      |GROUP BY src ORDER BY src""") { (s, d) =>
    val li = T(s, d, "lineitem")
    li.select(lit("f1").as("src"))
      .unionByName(li.select(lit("f2").as("src")))
      .groupBy("src")
      .agg(count(lit(1)).as("n"))
      .reportSorted("src")
  }

  // ---------------------------------------------------------------- H

  q("fn_string",
    """SELECT c_custkey, upper(c_name) AS uname, substring(c_name, 1, 8) AS pre,
      |       concat(c_mktsegment, '/', trim(c_name)) AS tagged
      |FROM customer ORDER BY c_custkey""") { (s, d) =>
    T(s, d, "customer")
      .select(col("c_custkey"), upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 8).as("pre"),
        concat(col("c_mktsegment"), lit("/"), trim(col("c_name"))).as("tagged"))
      .orderBy("c_custkey")
  }

  // GAMS users encode data in labels (Brand#13 → 13) — label-parse idiom.
  q("fn_label_parse",
    """SELECT p_partkey, CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INTEGER) AS brand_no
      |FROM part ORDER BY p_partkey""") { (s, d) =>
    T(s, d, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).cast(IntegerType).as("brand_no"))
      .orderBy("p_partkey")
  }

  // Pointwise IEEE arithmetic on identical inputs is bitwise identical
  // across engines → no rounding (rounding exact-half quotients is where
  // engines diverge). Only ln() is rounded: libm vs java Math.log can
  // differ in the last ulp.
  q("fn_math",
    """SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS adisc,
      |       power(l_quantity, 2) AS q2, round(ln(l_extendedprice), 6) AS lnp,
      |       l_extendedprice / nullif(l_quantity, 0) AS unit_price
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, unit_price NULLS FIRST, adisc, q2, lnp""") { (s, d) =>
    T(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("adisc"),
        pow(col("l_quantity"), 2).as("q2"),
        round(log(col("l_extendedprice")), 6).as("lnp"),
        (col("l_extendedprice") / nullif(col("l_quantity"), lit(0))).as("unit_price"))
      // (l_orderkey, l_linenumber) is NOT unique — order by every
      // output column for a total order, with NULLS FIRST pinned on
      // the nullable unit_price (Spark's ASC default; DuckDB's is
      // NULLS LAST, so the oracle says it explicitly)
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("unit_price").asc_nulls_first, col("adisc"), col("q2"), col("lnp"))
  }

  q("fn_date",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m,
      |       count(*) AS n,
      |       CAST(min(datediff('day', o_orderdate, TIMESTAMP '2002-01-01')) AS INTEGER) AS min_days,
      |       round(sum(o_totalprice), 2) AS tot
      |FROM orders GROUP BY y, m ORDER BY y, m""") { (s, d) =>
    T(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"),
        min(datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))).as("min_days"),
        round(sum("o_totalprice"), 2).as("tot"))
      .reportSorted("y", "m")
  }

  q("fn_array",
    """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
      |       round(CAST(embedding[1] AS DOUBLE), 6) AS e0,
      |       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS esum
      |FROM embeddings ORDER BY vec_id""") { (s, d) =>
    T(s, d, "embeddings")
      .select(col("vec_id"), size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"),
        round(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")), 4)
          .as("esum"))
      .orderBy("vec_id")
  }

  q("fn_json",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events ORDER BY event_id""") { (s, d) =>
    T(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .orderBy("event_id")
  }

  q("fn_map",
    """SELECT k, count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.' || k) AS INTEGER)) AS BIGINT) AS s
      |FROM (SELECT unnest(json_keys(props)) AS k, props FROM events) t
      |GROUP BY k ORDER BY k""") { (s, d) =>
    T(s, d, "events")
      .select(explode(from_json(col("props"), MapType(StringType, IntegerType))))
      .groupBy(col("key").as("k"))
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .select("k", "n", "s")
      .reportSorted("k")
  }

  // ---------------------------------------------------------------- I

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  private val wideSql =
    """SELECT user_id,
      |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY user_id""".stripMargin

  private def wideDf(s: org.apache.spark.sql.SparkSession, d: String) = {
    val piv = T(s, d, "events")
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    // pivot yields null for absent (user, type) combos; oracle COUNT gives 0
    piv.select(col("user_id") +: eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  q("reshape_long_to_wide", s"SELECT * FROM ($wideSql) t ORDER BY user_id") { (s, d) =>
    wideDf(s, d).orderBy("user_id") // one row per user = input-sized
  }

  q("reshape_wide_to_long",
    s"""WITH w AS ($wideSql)
       |SELECT user_id, 'click' AS event_type, click AS n FROM w
       |UNION ALL SELECT user_id, 'error', error FROM w
       |UNION ALL SELECT user_id, 'purchase', purchase FROM w
       |UNION ALL SELECT user_id, 'signup', signup FROM w
       |UNION ALL SELECT user_id, 'view', view FROM w
       |ORDER BY user_id, event_type""") { (s, d) =>
    wideDf(s, d)
      .unpivot(Array(col("user_id")), eventTypes.map(col).toArray, "event_type", "n")
      .orderBy("user_id", "event_type") // 5 rows per user = input-sized
  }

  // GDX densify: sparse symbol → dense grid over domain sets, default-filled.
  q("densify_default_fill",
    """WITH g AS (SELECT c.c_nationkey AS nationkey, o.o_orderstatus AS status, count(*) AS n
      |           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |           GROUP BY 1, 2),
      |     grid AS (SELECT n.n_nationkey AS nationkey, st.status
      |              FROM nation n CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) st)
      |SELECT grid.nationkey, grid.status, COALESCE(g.n, 0) AS n
      |FROM grid LEFT JOIN g ON g.nationkey = grid.nationkey AND g.status = grid.status
      |ORDER BY grid.nationkey, grid.status""") { (s, d) =>
    val g = T(s, d, "orders")
      .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"))
    val grid = T(s, d, "nation").select(col("n_nationkey").as("nationkey"))
      .crossJoin(T(s, d, "orders").select(col("o_orderstatus").as("status")).distinct())
    grid.join(g, Seq("nationkey", "status"), "left")
      .select(col("nationkey"), col("status"), coalesce(col("n"), lit(0L)).as("n"))
      .reportSorted("nationkey", "status")
  }

  // GDX sparsify: drop default-valued (zero) records — what GDX storage
  // does on write (EPS-flagged zeros are retained by the gdx module).
  q("sparsify",
    """SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
      |WHERE l_discount <> 0.0 ORDER BY l_orderkey, l_linenumber, l_discount""") { (s, d) =>
    T(s, d, "lineitem")
      .filter(col("l_discount") =!= 0.0)
      .select("l_orderkey", "l_linenumber", "l_discount")
      .orderBy("l_orderkey", "l_linenumber", "l_discount")
  }

  // ---------------------------------------------------------------- K

  // Scalar UDF surface (SURVEY §2.K udf_surface): label normalizer as a
  // Scala UDF. Kept deliberately minimal — everywhere else we use
  // builtins so whole-stage codegen survives; this query documents the
  // escape hatch and its cost (opaque to Catalyst, no pushdown through it).
  q("udf_surface",
    """SELECT c_custkey, regexp_replace(lower(trim(c_mktsegment)), ' +', ' ', 'g') AS seg
      |FROM customer ORDER BY c_custkey""") { (s, d) =>
    // Locale.ROOT: bare toLowerCase is default-locale-sensitive (a
    // tr_TR JVM maps 'I' to dotless ı) while the oracle's lower() is
    // locale-independent
    val normalize = udf((x: String) =>
      if (x == null) null
      else x.trim.toLowerCase(java.util.Locale.ROOT).replaceAll(" +", " "))
    T(s, d, "customer")
      .select(col("c_custkey"), normalize(col("c_mktsegment")).as("seg"))
      .orderBy("c_custkey")
  }

  // UDTF surface (SURVEY §2.K udtf_explode_embedding): one row per
  // (vec_id, pos, component) via the builtin posexplode Generator — a
  // custom Generator is only warranted for semantics builtins lack.
  q("udtf_explode_embedding",
    """SELECT vec_id, CAST(i AS INTEGER) - 1 AS pos,
      |       round(CAST(embedding[i] AS DOUBLE), 6) AS comp
      |FROM (SELECT vec_id, embedding,
      |             unnest(generate_series(1, len(embedding))) AS i
      |      FROM embeddings) t
      |ORDER BY vec_id, pos""") { (s, d) =>
    T(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"),
        round(col("col").cast("double"), 6).as("comp"))
      .orderBy("vec_id", "pos")
  }
}
