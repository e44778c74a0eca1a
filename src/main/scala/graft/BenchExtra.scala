package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Extra optimization-round measurements (guide §1.4), SEPARATE from
  * the frozen driver bench: isolates the sub-paths the r6 work touches
  * so before/after claims in OPTIMIZATION_r06.md rest on direct
  * numbers, not inference from the 82-key totals.
  *
  *  - `pipeline`: Stages.triples(...).count() — the headline DAG,
  *    including its per-invocation gazetteer/dictionary derivations;
  *  - `gazetteer_job`: one corpus gazetteer derivation (collect) — the
  *    unit the r6 Stages refactor removes 3 copies of per triples call;
  *  - `pagerank` / `pagerank_w` / `comention` / `triangles`: the graph
  *    operators over a fresh (non-memoized) triple table, noop-sunk;
  *  - `langid`: the text_langid operator, noop-sunk.
  *
  * Each metric reports best-of-`SPARK_GRAFT_BENCH_PASSES` (default 3),
  * mirroring the driver bench's noise discipline. ONE JSON line.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(label: String)(f: => Unit): (String, Double) = {
      spark.sparkContext.setJobDescription(label)
      val t = (1 to passes).map(_ => time(f)).min
      spark.sparkContext.setJobDescription(null)
      label -> t
    }

    // warmup: footers + codegen
    graft.core.Tables.documents(spark, sfDir).count()
    noop(graft.kg.Stages.gazetteer(spark, sfDir))

    val mentionTriples = graft.kg.Stages.triples(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      .where(col("pred") === "mentionedIn")

    val results = Seq(
      best("gazetteer_job") {
        graft.kg.Stages.gazetteer(spark, sfDir).collect(): Unit
      },
      best("pipeline") {
        graft.kg.Stages.triples(spark, sfDir).count(): Unit
      },
      best("comention") {
        noop(graft.kg.GraphAnalytics.comentionTopK(mentionTriples))
      },
      best("pagerank") {
        noop(graft.kg.GraphAnalytics.pagerankInt(
          graft.kg.GraphAnalytics.comentionTopK(mentionTriples)))
      },
      best("pagerank_w") {
        noop(graft.kg.GraphAnalytics.pagerankIntW(
          graft.kg.GraphAnalytics.comentionTopK(mentionTriples)))
      },
      best("triangles") {
        noop(graft.kg.GraphAnalytics.mutualTriangles(
          graft.kg.GraphAnalytics.comentionTopK(mentionTriples)))
      },
      best("langid") {
        noop(graft.dataprep.TextAnalysis.langId(
          graft.core.Tables.documents(spark, sfDir)))
      })

    val js = results.map { case (k, v) => "\"" + k + "\":" + Bench.f3(v) }
      .mkString("{", ",", "}")
    println(s"""{"bench":"extra","sf":"$sfDir","cpus":$cpus,"passes":$passes,"metrics":$js}""")
    spark.stop()
  }
}
