package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2,
  * assembled from the per-category modules under graft.ops; `oracleSql`
  * carries the DuckDB-dialect equivalent for every SQL-expressible one.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    ops.RelationalOps, ops.WindowOps, ops.FunctionSetOps,
    ops.StreamingBatchOps, ops.LlmOps, ops.MultimodalOps, ops.GdxOps,
    ops.SkewOps, ops.FormatOps, ops.TokenizerOps, ops.GraphOps,
    ops.AnalyticsOps, ops.CurationOps)

  private lazy val all: Seq[QueryDef] = {
    val ds = modules.flatMap(_.defs)
    val dup = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query keys: ${dup.mkString(",")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join lineitem⋈orders⋈customer⋈nation⋈region with filter +
    * per-(region, year) revenue — dims broadcast, one shuffle for the agg.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    T(spark, d, "lineitem")
      .filter(col("l_quantity") > 5)
      .join(T(spark, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T(spark, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T(spark, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T(spark, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("y"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "y")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.collect { case d if d.oracle.isDefined => d.name -> d.oracle.get }.toMap

  /** Data-parameterized oracles (SQL embedding a deterministic trained
    * artifact of the corpus) — materialized by Verify with the same
    * (spark, sfDir) the queries ran against, then dumped alongside
    * [[oracleSql]] in oracle_sql.json.
    */
  def dynOracleSql: Map[String, (SparkSession, String) => String] =
    all.collect { case d if d.oracleGen.isDefined => d.name -> d.oracleGen.get }.toMap
}
