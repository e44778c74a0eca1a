package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Model
import graft.sources.SnapshotStore

/** Production DAG entry point (SURVEY.md §3.1, BASELINE.json
  * north_rule): `spark-submit --class graft.kg.Pipeline <jar> <sfDir>
  * <outDir>` runs mention-detect → candidate-generate → link-score →
  * canonicalize → triple-emit with per-partition snapshot checkpoints.
  *
  * Resume model: the corpus is hash-bucketed on doc_id; the expensive
  * scan stage (mention detection) commits one snapshot PER BUCKET with
  * an idempotence marker. Re-running after a crash consults the
  * manifest markers and recomputes only missing buckets — the
  * Dataset-level equivalent of the contract's "resumable from
  * checkpoint with per-partition lineage + metrics". Downstream stages
  * are dictionary-sized or aggregate-sized and re-derive cheaply, each
  * behind its own marker.
  *
  * At 10^12 docs the bucket count scales with the cluster (NB ≈ number
  * of executor-hours per retry unit); everything else is unchanged —
  * no driver-side state grows with corpus size except the manifest
  * list.
  */
object Pipeline {

  val NumBuckets = 8

  def run(spark: SparkSession, sfDir: String, outDir: String): SnapshotStore = {
    val store = new SnapshotStore(outDir)
    val done = store.markers()

    val gazSeq = Stages.gazetteer(spark, sfDir)
      .select(col("surface"), col("coarse_type"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

    // Stage 1: per-bucket mention detection (the only corpus-wide scan).
    val docs = Corpus.docs(spark, sfDir)
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(NumBuckets)).cast("int"))
    (0 until NumBuckets).foreach { b =>
      val marker = s"mentions-bucket-$b"
      if (!done.contains(marker)) {
        val spans = Corpus.explodeSpans(
          docs.where(col("bucket") === b).drop("bucket"))
        val m = Engine.mentions(spans, gazSeq)
          .withColumn("bucket", lit(b))
        store.commit(m, stage = "mentions", marker = marker,
          metrics = Map("bucket" -> b.toLong))
      }
    }

    val mentions = store.read(spark, stage = Some("mentions")).drop("bucket")

    // Stage 2+3: candidates + link scoring (dictionary joins + argmax).
    if (!store.markers().contains("links")) {
      val links = Engine.links(
        Engine.candidates(mentions, Stages.anchorDict(spark, sfDir)),
        Stages.scoreBoost)
      store.commit(links, stage = "links", marker = "links")
    }
    val links = store.read(spark, stage = Some("links"))

    // Stage 4: canonicalization (CC over the alias graph).
    if (!store.markers().contains("canonical")) {
      store.commit(Engine.canonical(Stages.aliasEdges(spark, sfDir)),
        stage = "canonical", marker = "canonical")
    }
    val canon = store.read(spark, stage = Some("canonical"))

    // Stage 5: triple emit, partitioned by predicate for pruned reads.
    if (!store.markers().contains("triples")) {
      val spans = Corpus.explodeSpans(Corpus.docs(spark, sfDir))
      val triples = Engine.triples(links, canon, spans)
      store.commit(triples, stage = "triples", marker = "triples",
        partitionBy = Seq("pred"))
    }
    store
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("target/pipeline-out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-kg-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = run(spark, sfDir, outDir)
    val triples = store.read(spark, stage = Some("triples"))
    val n = triples.count()
    println(s"""{"pipeline":"ok","triples":$n,"snapshots":${store.manifests().size}}""")
    spark.stop()
  }
}
