package graft

import org.apache.spark.sql.SparkSession

/** Per-key formatted-plan dumper for the optimization rounds: writes
  * one `<outDir>/<key>_<suffix>.txt` per requested key containing the
  * `.explain("formatted")` output, so plan-shape claims in
  * OPTIMIZATION_r*.md are checkable artifacts (guide §1: capture the
  * plan before and after every change).
  *
  * Run: sbt "runMain graft.PlanDump <outDir> <suffix> <key> [key...]"
  * (key "ALL" dumps every registered query.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <key...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val keys =
      if (args.drop(2).sameElements(Array("ALL"))) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    keys.foreach { key =>
      val df = SparkEntry.queries(key)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${key}_$suffix.txt"), txt)
      println(s"dumped $key")
    }
    spark.stop()
  }
}
