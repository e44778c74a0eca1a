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

    // single-scan guard (VERDICT r1 #1): all NumBuckets mention
    // manifests must come from ONE write job — i.e. share one snap-N
    // parent dir — not one corpus scan per bucket.
    val mentionDirs = store.manifests().filter(_.stage == "mentions").map(_.dir)
    assert(mentionDirs.size == Pipeline.NumBuckets)
    assert(mentionDirs.map(d => java.nio.file.Paths.get(d).getParent).toSet.size == 1)
    // per-partition lineage: every bucket manifest carries its bucket id
    // and its source doc_id range (north-star manifest contract)
    val mms = store.manifests().filter(_.stage == "mentions")
    assert(mms.flatMap(_.metrics.get("bucket")).toSet ==
      (0 until Pipeline.NumBuckets).map(_.toLong).toSet)
    mms.filter(_.rows > 0).foreach { m =>
      assert(m.metrics.contains("min_doc_id") && m.metrics.contains("max_doc_id")
        && m.metrics("min_doc_id") <= m.metrics("max_doc_id"), m)
    }

    val nSnaps = store.manifests().size
    val store2 = Pipeline.run(spark, sf, out) // resume on a complete run
    assert(store2.manifests().size == nSnaps) // nothing recommitted
  }

  test("runAnalytics: committed graph stages == declarative analytics; resume is a no-op") {
    val out = Files.createTempDirectory("pipe-an").toString
    val store = Pipeline.run(spark, sf, out)
    Pipeline.runAnalytics(spark, store)

    // stage content ≡ the declarative forms over the same corpus
    val wantPr = GraphAnalytics.pagerankInt(
      GraphAnalytics.comentionTopK(
        Stages.triples(spark, sf).where(col("pred") === "mentionedIn")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotPr = store.read(spark, stage = Some("graph_pagerank"))
      .collect().map(r => r.getAs[String]("n") -> r.getAs[Long]("pr")).toMap
    assert(gotPr == wantPr && gotPr.nonEmpty)
    val gotDeg = store.read(spark, stage = Some("graph_degree"))
    assert(gotDeg.count() ==
      GraphAnalytics.degrees(Stages.triples(spark, sf)).count())

    // marker idempotence: a resumed analytics run over UNCHANGED
    // triples recommits nothing
    val nSnaps = store.manifests().size
    Pipeline.runAnalytics(spark, store)
    assert(store.manifests().size == nSnaps)

    // incremental maintenance: a later batch lands more triples → the
    // derived stages REFRESH, each superseding its stale predecessor
    // (latest reads serve one fresh snapshot, never stale ∪ fresh)
    import spark.implicits._
    val extra = Seq(("E9_zzz", "hasType", "PER"),
      ("E9_zzz", "mentionedIn", "doc:x1")).toDF("subj", "pred", "obj")
    store.commit(extra, "triples", "triples-extra", partitionBy = Seq("pred"))
    val degBefore = gotDeg.count()
    Pipeline.runAnalytics(spark, store)
    assert(store.liveManifests().count(_.stage == "graph_degree") == 1)
    val degAfter = store.read(spark, stage = Some("graph_degree"))
    assert(degAfter.count() == degBefore + 1)
    assert(degAfter.where(col("subj") === "E9_zzz").count() == 1)
    // and the refreshed state reruns as a no-op again
    val nSnaps2 = store.manifests().size
    Pipeline.runAnalytics(spark, store)
    assert(store.manifests().size == nSnaps2)

    // the analytics never rescan the corpus: they read only committed
    // stages, so the whole call plans ZERO parquet scans outside the
    // store root
    val storeRoot = java.nio.file.Paths.get(out).toAbsolutePath.toString
    val out2 = Files.createTempDirectory("pipe-an2").toString
    val store2 = Pipeline.run(spark, sf, out2)
    val extScans = countScansOutside(out2) {
      Pipeline.runAnalytics(spark, store2)
    }
    assert(extScans == 0,
      s"runAnalytics planned $extScans parquet scans outside the store ($storeRoot)")
  }

  /** Count FileSourceScans over parquet NOT under `root` across all
    * queries executed inside `body` (the inverse of countCorpusScans'
    * filter — proves a consumer touches only committed stages). */
  private def countScansOutside(root: String)(body: => Unit): Int = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val rootAbs = java.nio.file.Paths.get(root).toAbsolutePath.toString
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private def count(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
        case s: FileSourceScanExec =>
          val locs = s.relation.location.rootPaths.map(_.toString)
          if (locs.exists(l => !l.contains(rootAbs))) 1 else 0
        case other => other.children.map(count).sum +
          other.subqueries.map(count).sum
      }
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit = n.addAndGet(count(qe.executedPlan))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body
      org.apache.spark.graftbridge.TestListenerBridge.drain(spark.sparkContext)
      n.get()
    } finally spark.listenerManager.unregister(listener)
  }

  test("crash-resume: half-done mention buckets are not recomputed, result identical") {
    val out = Files.createTempDirectory("pipe-resume").toString
    val store = graft.sources.SnapshotStore.forRoot(out)

    // simulate a run that died after committing buckets 0..3 (one
    // grouped scan, e.g. bucketsPerScan=4, crashed before the second)
    val gazSeq = Stages.gazetteer(spark, sf)
      .select(col("surface"), col("coarse_type"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    def bucketOf(c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c), lit(Pipeline.NumBuckets)).cast("int")
    val docs = Corpus.docs(spark, sf).where(bucketOf(col("doc_id")).isin(0 to 3: _*))
    val m = Engine.mentions(Corpus.explodeSpansAdj(docs), gazSeq,
        carry = Seq(Engine.AdjMedia))
      .withColumn("bucket", bucketOf(col("doc_id")))
    store.commitBuckets(m, stage = "mentions", bucketCol = "bucket",
      buckets = 0 to 3, markerFor = b => s"mentions-bucket-$b")
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

  /** Counts FileSourceScan executions over `corpusDir` across every
    * job `body` runs. Typed traversal: AQE wraps the final plan in
    * leaf nodes whose STRING form also repeats the initial plan —
    * count scan NODES, descending through AdaptiveSparkPlanExec /
    * QueryStageExec leaves. */
  private def countCorpusScans(corpusDir: String)(body: => Unit): Int = {
    val nScans = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      private def count(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
        case q: QueryStageExec => count(q.plan)
        case f: FileSourceScanExec =>
          if (f.relation.location.rootPaths.exists(_.toString.contains(corpusDir))) 1 else 0
        case other => other.children.map(count).sum
      }
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit =
        nScans.addAndGet(count(qe.executedPlan)): Unit
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body
      org.apache.spark.graftbridge.TestListenerBridge.drain(spark.sparkContext)
      nScans.get
    } finally spark.listenerManager.unregister(listener)
  }

  test("the whole DAG scans the corpus parquet exactly once") {
    // The corpus as its own nested parquet table (production shape);
    // count scans over it across EVERY job the pipeline runs —
    // mention detection is the only permitted reader (depictedIn
    // adjacency rides the mention rows; VERDICT r2 #3, r3 #6).
    val corpusDir = Files.createTempDirectory("corpus").resolve("corpus.parquet").toString
    Corpus.docs(spark, sf).write.parquet(corpusDir)
    val out = Files.createTempDirectory("pipe-onescan").toString
    var store: graft.sources.SnapshotStore = null
    val n = countCorpusScans(corpusDir) {
      store = Pipeline.run(spark, sf, out, corpusPath = Some(corpusDir))
    }
    assert(n == 1, s"corpus scanned $n times, want 1")
    val got = tripleSet(store.read(spark, stage = Some("triples")))
    assert(got == tripleSet(Stages.triples(spark, sf)) && got.nonEmpty)
  }

  test("declarative (no-materialization) triples query also scans the corpus once") {
    // VERDICT r3 #6: the query form used to plan the corpus scan twice
    // (links subtree + media subtree). With in-row adjacency there IS
    // no media subtree — one FileSourceScan in the one executed query.
    val corpusDir = Files.createTempDirectory("corpus-q").resolve("corpus.parquet").toString
    Corpus.docs(spark, sf).write.parquet(corpusDir)
    val gazSeq = Stages.gazetteer(spark, sf)
      .select(col("surface"), col("coarse_type"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    val carry = Seq(Engine.AdjMedia)
    val links = Engine.links(
      Engine.candidates(
        Engine.mentions(Corpus.explodeSpansAdj(spark.read.parquet(corpusDir)), gazSeq, carry),
        Stages.anchorDict(spark, sf), carry),
      Stages.scoreBoost, carry)
    val triples = Engine.triples(links, Stages.canonicalMap(spark, sf),
      canonRows = Some(3L * Stages.GazetteerSize))
    var got: Set[(String, String, String)] = Set.empty
    val n = countCorpusScans(corpusDir) { got = tripleSet(triples) }
    assert(n == 1, s"declarative form scanned the corpus $n times, want 1")
    assert(got == tripleSet(Stages.triples(spark, sf)) && got.nonEmpty)
  }

  test("bucketsPerScan retry-unit knob: grouped scans produce identical output") {
    val out = Files.createTempDirectory("pipe-grouped").toString
    val store = Pipeline.run(spark, sf, out, bucketsPerScan = 3)
    // 8 buckets in groups of 3 → 3 write jobs → 3 distinct snap parents
    val mentionDirs = store.manifests().filter(_.stage == "mentions").map(_.dir)
    assert(mentionDirs.map(d => java.nio.file.Paths.get(d).getParent).toSet.size == 3)
    val got = tripleSet(store.read(spark, stage = Some("triples")))
    assert(got == tripleSet(Stages.triples(spark, sf)))
  }
}
