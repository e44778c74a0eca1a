package graft.queries

import graft.SparkSuite

/** Physical-plan regression guards (SURVEY.md §4): the scale-critical
  * plan properties must not silently regress — a plan that stops
  * broadcasting the dictionary or stops pushing filters still returns
  * correct rows at sf0.01 but dies at 100 TB. */
class PlanPropertiesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(key: String): String = {
    val df = graft.SparkEntry.queries(key)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val p = executedPlan("filter_pred")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("LessThan(l_shipdate"), p.take(800))
  }

  test("project prunes the read schema to referenced columns") {
    val p = executedPlan("project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_extendedprice:double,l_discount:double>"), p.take(800))
  }

  test("dictionary joins broadcast the small side") {
    assert(executedPlan("join_broadcast").contains("BroadcastHashJoin"))
    assert(executedPlan("kg_candidates").contains("BroadcastHashJoin"))
  }

  test("topk plans as TakeOrderedAndProject, not a global sort") {
    val p = executedPlan("topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("span explode is a Generate fused over the scan (no shuffle before it)") {
    val p = executedPlan("explode_spans")
    assert(p.contains("Generate posexplode"), p.take(600))
    assert(!p.contains("Exchange"), "explode must not shuffle:\n" + p.take(800))
  }

  test("salted join shuffles on the composite (key, salt)") {
    val p = executedPlan("join_salted")
    assert(p.contains("salt"), p.take(800))
  }
}
