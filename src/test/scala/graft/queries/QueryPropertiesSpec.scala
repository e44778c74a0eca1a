package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** Cross-implementation properties over the real sf0.001 testdata:
  * the salted skew join must be result-identical to the plain join
  * (SURVEY.md §5.2), and the flagship entry must produce triples. */
class QueryPropertiesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("salted join ≡ plain join (same groups, same aggregates)") {
    val salted = RelationalQueries.all("join_salted").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"), Q.dsum(col("l_quantity")).as("sum_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("flagship entry returns non-empty triples with the full vocabulary") {
    val t = graft.SparkEntry.entry(spark)
    val preds = t.select("pred").distinct().collect().map(_.getString(0)).toSet
    assert(preds == Set("mentionedIn", "hasType", "depictedIn"))
  }

  test("every oracle key exists in queries and SQL is non-empty") {
    val qs = graft.SparkEntry.queries
    graft.SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(qs.contains(k), s"oracle without query: $k")
      assert(sql.trim.nonEmpty && !sql.contains("stripMargin"))
      assert(!sql.linesIterator.exists(_.trim.startsWith("|")),
        s"unstripped margin in $k")
    }
  }
}
