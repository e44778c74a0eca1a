package graft.queries

import org.apache.spark.sql.functions._

import graft.kg.{GraphAnalytics, Stages}

/** Analytics over the CONSTRUCTED knowledge graph (graft.kg
  * .GraphAnalytics) as harness-visible operators: every key recomputes
  * the full corpus→triples chain in DuckDB (KgQueries.tripleChain) and
  * then replays the analytic on top — the oracle covers pipeline AND
  * consumption end to end. PageRank is fixed-point integer arithmetic
  * precisely so this cross-engine replay is bit-exact (float PageRank
  * would diverge by summation order).
  *
  * Oracle-parity caveats, both non-binding at fixture scale and
  * documented on the Spark operators: `maxPerDoc` must exceed the
  * fixture's per-doc entity count (≤ gazetteer size = 30 here), and
  * top-k ties are totally ordered by (weight desc, dst asc) in both
  * engines.
  */
object GraphQueries {

  /** Neighbor budget interpolated into the oracle SQL — tied to the
    * Spark side's default so the two cannot drift apart. */
  private val K = GraphAnalytics.DefaultTopK

  /** Sparsified co-mention CTEs shared by comention / pagerank /
    * triangles: SQL mirror of GraphAnalytics.comentionTopK (the
    * self-join pair formulation is equivalent to the in-row pair
    * generation as long as maxPerDoc does not bind — see caveat). */
  private val comentionSql: String =
    s"""ment AS (
      |  SELECT DISTINCT subj AS entity, obj AS doc FROM triples
      |  WHERE pred = 'mentionedIn'
      |),
      |pairs AS (
      |  SELECT a.entity AS e1, b.entity AS e2, count(*) AS weight
      |  FROM ment a JOIN ment b ON a.doc = b.doc AND a.entity < b.entity
      |  GROUP BY a.entity, b.entity
      |),
      |sym AS (
      |  SELECT e1 AS src, e2 AS dst, weight FROM pairs
      |  UNION ALL
      |  SELECT e2, e1, weight FROM pairs
      |),
      |topk AS (
      |  SELECT src, dst, weight FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY src ORDER BY weight DESC, dst) AS rn
      |    FROM sym) WHERE rn <= $K
      |)""".stripMargin

  /** One integer-PageRank iteration as CTEs: contribution = pr div deg
    * (integral division both engines), damped sum in BIGINT. DuckDB's
    * sum(BIGINT) widens to HUGEINT — the CAST keeps the oracle column
    * BIGINT to match Spark's LongType. */
  private def prIterSql(k: Int): String = {
    val prev = if (k == 1) "r0" else s"r${k - 1}"
    s"""c$k AS (
       |  SELECT e.dst AS n, sum(r.pr // d.deg) AS s
       |  FROM topk e JOIN $prev r ON e.src = r.n JOIN deg d ON e.src = d.src
       |  GROUP BY e.dst
       |),
       |r$k AS (
       |  SELECT $prev.n AS n,
       |         150000 + (85 * CAST(coalesce(c$k.s, 0) AS BIGINT)) // 100 AS pr
       |  FROM $prev LEFT JOIN c$k ON $prev.n = c$k.n
       |)""".stripMargin
  }

  private val pagerankSql: Seq[String] = Seq(
    "deg AS (SELECT src, count(*) AS deg FROM topk GROUP BY src)",
    "r0 AS (SELECT src AS n, CAST(1000000 AS BIGINT) AS pr FROM deg)",
    prIterSql(1), prIterSql(2), prIterSql(3))

  /** One WEIGHTED integer-PageRank iteration: contribution =
    * (rank · share) div 10^6 with share = per-edge millionths of the
    * source's out-weight (GraphAnalytics.pagerankIntW). */
  private def prwIterSql(k: Int): String = {
    val prev = if (k == 1) "w0" else s"w${k - 1}"
    s"""wc$k AS (
       |  SELECT e.dst AS n, sum((r.pr * e.share) // 1000000) AS s
       |  FROM shr e JOIN $prev r ON e.src = r.n
       |  GROUP BY e.dst
       |),
       |w$k AS (
       |  SELECT $prev.n AS n,
       |         150000 + (85 * CAST(coalesce(wc$k.s, 0) AS BIGINT)) // 100 AS pr
       |  FROM $prev LEFT JOIN wc$k ON $prev.n = wc$k.n
       |)""".stripMargin
  }

  private val pagerankWSql: Seq[String] = Seq(
    "sw AS (SELECT src, CAST(sum(weight) AS BIGINT) AS sw FROM topk GROUP BY src)",
    """shr AS (
      |  SELECT t.src, t.dst, (t.weight * 1000000) // s.sw AS share
      |  FROM topk t JOIN sw s ON t.src = s.src
      |)""".stripMargin,
    "w0 AS (SELECT src AS n, CAST(1000000 AS BIGINT) AS pr FROM sw)",
    prwIterSql(1), prwIterSql(2), prwIterSql(3))

  /** The constructed triple table, DISK_ONLY-persisted and MEMOIZED per
    * (session, dir): all graph keys — and repeated calls to the same
    * key — share ONE materialization, mirroring production, where
    * analytics read the pipeline-COMMITTED triple stage
    * (graft.kg.Pipeline.runAnalytics) instead of re-deriving the corpus
    * chain per query. Memoizing the DataFrame INSTANCE matters: each
    * Stages.triples call embeds a fresh gazetteer broadcast, so two
    * builds are never plan-canonically equal and Spark's plan-keyed
    * CacheManager would treat every call as a new cache entry (measured:
    * per-key floors DOUBLED under naive per-call persist — each key paid
    * a cache write nothing else could read). */
  private val triplesCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]()
  private def triplesTable(s: org.apache.spark.sql.SparkSession, d: String) = {
    // a long-lived JVM cycling sessions must not pin dead sessions (and
    // their plans) through the memo — evict entries whose context stopped
    triplesCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    triplesCache.computeIfAbsent((s, d), _ =>
      Stages.triples(s, d)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
  }

  private def mentionTriples(s: org.apache.spark.sql.SparkSession, d: String) =
    triplesTable(s, d).where(col("pred") === "mentionedIn")

  val all: Map[String, Q] = Map(

    "graph_degree" -> Q(
      KgQueries.tripleChain()(
        """SELECT subj, count(*) AS n_triples,
          |  count(DISTINCT pred) AS n_preds,
          |  count(DISTINCT obj) AS n_objs
          |FROM triples GROUP BY subj""".stripMargin))(
      (s, d) => GraphAnalytics.degrees(triplesTable(s, d))),

    "graph_comention" -> Q(
      KgQueries.tripleChain(comentionSql)(
        "SELECT src, dst, weight FROM topk"))(
      (s, d) => GraphAnalytics.comentionTopK(mentionTriples(s, d))),

    "graph_pagerank" -> Q(
      KgQueries.tripleChain(comentionSql +: pagerankSql: _*)(
        "SELECT n, pr FROM r3"))(
      (s, d) => GraphAnalytics.pagerankInt(
        GraphAnalytics.comentionTopK(mentionTriples(s, d)), iters = 3)),

    "graph_pagerank_w" -> Q(
      KgQueries.tripleChain(comentionSql +: pagerankWSql: _*)(
        "SELECT n, pr FROM w3"))(
      (s, d) => GraphAnalytics.pagerankIntW(
        GraphAnalytics.comentionTopK(mentionTriples(s, d)), iters = 3)),

    "graph_triangles" -> Q(
      KgQueries.tripleChain(comentionSql,
        """mut AS (
          |  SELECT a.src AS e1, a.dst AS e2 FROM topk a
          |  JOIN topk b ON a.src = b.dst AND a.dst = b.src
          |  WHERE a.src < a.dst
          |)""".stripMargin)(
        """SELECT CAST(count(*) AS BIGINT) AS n_triangles,
          |  CAST((SELECT count(*) FROM mut) AS BIGINT) AS n_edges
          |FROM mut p1 JOIN mut p2 ON p1.e2 = p2.e1
          |JOIN mut p3 ON p3.e1 = p1.e1 AND p3.e2 = p2.e2""".stripMargin))(
      (s, d) => GraphAnalytics.mutualTriangles(
        GraphAnalytics.comentionTopK(mentionTriples(s, d))))
  )
}
