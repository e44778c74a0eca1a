package graft.kg

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** End-to-end pipeline + resume semantics on real sf0.001 testdata. */
class PipelineSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def tripleSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.select("subj", "pred", "obj").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("pipeline output == direct stage composition; re-run is a no-op") {
    val out = Files.createTempDirectory("pipe").toString
    val store = Pipeline.run(spark, sf, out)
    val got = tripleSet(store.read(spark, stage = Some("triples")))
    val want = tripleSet(Stages.triples(spark, sf))
    assert(got == want && got.nonEmpty)

    val nSnaps = store.manifests().size
    val store2 = Pipeline.run(spark, sf, out) // resume on a complete run
    assert(store2.manifests().size == nSnaps) // nothing recommitted
  }

  test("crash-resume: half-done mention buckets are not recomputed, result identical") {
    val out = Files.createTempDirectory("pipe-resume").toString
    val store = new graft.sources.SnapshotStore(out)

    // simulate a run that died after committing buckets 0..3
    val gazSeq = Stages.gazetteer(spark, sf)
      .select(col("surface"), col("coarse_type"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    val docs = Corpus.docs(spark, sf)
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(Pipeline.NumBuckets)).cast("int"))
    (0 until 4).foreach { b =>
      val spans = Corpus.explodeSpans(docs.where(col("bucket") === b).drop("bucket"))
      store.commit(Engine.mentions(spans, gazSeq).withColumn("bucket", lit(b)),
        stage = "mentions", marker = s"mentions-bucket-$b",
        metrics = Map("bucket" -> b.toLong))
    }
    val preIds = store.manifests().map(_.id).toSet
    assert(preIds.size == 4)

    val resumed = Pipeline.run(spark, sf, out)
    // the four pre-crash snapshots survive untouched (ids preserved)
    assert(preIds.subsetOf(resumed.manifests().map(_.id).toSet))
    assert(resumed.manifests().count(_.stage == "mentions") == Pipeline.NumBuckets)

    val got = tripleSet(resumed.read(spark, stage = Some("triples")))
    val want = tripleSet(Stages.triples(spark, sf))
    assert(got == want)
  }
}
