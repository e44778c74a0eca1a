package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark (driver contract): times every SparkEntry query
  * on $SPARK_GRAFT_SF_DIR at local[$SPARK_GRAFT_CPUS], prints ONE JSON
  * line. Measurement notes (SURVEY.md §3.3):
  *  - queries are executed with a `noop`-format write, not `count()`,
  *    so Catalyst cannot column-prune away the measured work;
  *  - a warmup pass absorbs session/codegen/parquet-footer costs so the
  *    per-query numbers reflect steady-state execution;
  *  - the flagship KG pipeline additionally reports triples/sec (the
  *    contract's headline metric) via a counted full run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noopRun(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup: touch every table (footers, filesystem), JIT scan/agg/join
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    noopRun(graft.core.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(count(lit(1))))

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try noopRun(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: KG pipeline throughput (mention-detect → … → triple-emit)
    val t0 = System.nanoTime()
    val nTriples = graft.kg.Stages.triples(spark, sfDir).count()
    val pipeSec = (System.nanoTime() - t0) / 1e9
    val tps = nTriples / pipeSec

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"pipeline":{"triples":$nTriples,"sec":$pipeSec%.3f,"triples_per_sec":$tps%.1f}}""")
    spark.stop()
  }
}
