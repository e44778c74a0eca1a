package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DataPrepQueries, GraphQueries, KgQueries, Q, RelationalQueries}

/** Driver contract (SURVEY.md §3.2): one `queries` key per implemented
  * operator from SURVEY.md §2 plus the training-data operator set; each
  * SQL-expressible key carries a DuckDB oracle over the same parquet.
  * Registry lives in graft.queries.* — Spark query and oracle SQL are
  * defined side by side so they can't drift apart.
  */
object SparkEntry {

  private lazy val registry: Map[String, Q] =
    RelationalQueries.all ++ KgQueries.all ++ DataPrepQueries.all ++
      GraphQueries.all

  /** Flagship query: the full KG pipeline (mention-detect →
    * candidate-generate → link-score → canonicalize → triple-emit) on
    * sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    graft.kg.Stages.triples(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
