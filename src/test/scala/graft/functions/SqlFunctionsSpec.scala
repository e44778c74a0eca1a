package graft.functions

import graft.SparkSuite

class SqlFunctionsSpec extends SparkSuite {
  test("custom expressions callable from SQL after registration") {
    SqlFunctions.register(spark)
    import spark.implicits._
    Seq(("Hello, World!", Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("t", "a", "b").createOrReplaceTempView("sqlfn_t")
    val r = spark.sql(
      "SELECT normalize_surface(t) AS n, vec_dot(a, b) AS d FROM sqlfn_t")
      .collect().head
    assert(r.getString(0) == "hello world")
    assert(r.getDouble(1) == 11.0)
  }
}
