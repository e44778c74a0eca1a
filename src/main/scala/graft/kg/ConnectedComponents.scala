package graft.kg

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components on a Dataset edge table — no RDD/GraphX
  * (BASELINE.json: "no RDD fallback"). Used to canonicalize entities
  * over the redirect/alias graph (SURVEY.md §4.4).
  *
  * Two implementations:
  *  - `alternating`: Kiveris et al., "Connected Components in MapReduce
  *    and Beyond" (SoCC 2014) large-star/small-star. O(log² n) rounds,
  *    per-round cost O(|E|) with a single groupBy shuffle — this is the
  *    100 TB path (alias graphs with long redirect chains or huge
  *    components still converge in a handful of rounds).
  *  - `minLabel`: simple min-label propagation, O(diameter) rounds.
  *    Kept as the differential-testing oracle for `alternating`.
  *
  * Output: (entity_id, canonical_id) for every node appearing in the
  * edge set; canonical_id = lexicographic min of the component.
  * Deterministic by construction (min is order-insensitive).
  */
object ConnectedComponents {

  /** Edge sets at or under this row count are solved with a driver-side
    * union-find instead of the distributed fixpoint. One driver-looped
    * large-star/small-star round costs several whole Spark jobs of
    * fixed scheduling latency — for a dictionary-sized alias graph that
    * constant dominates (and being parallelism-independent, it also
    * poisons cluster-scaling efficiency). Collecting ≤1M (src, dst)
    * string pairs is the same driver-memory class as a broadcast-join
    * build side; genuinely large graphs take the distributed path. */
  val LocalEdgeThreshold = 1000000L

  /** Driver-orchestrated fixpoint loop; each iteration is a fresh job.
    * `localCheckpoint` every round truncates lineage so plans don't grow
    * exponentially across iterations. Tiny graphs short-circuit to a
    * driver-local union-find (same output contract, differentially
    * tested against the distributed path). */
  def alternating(edgesIn: DataFrame, maxIter: Int = 50,
                  localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val spark = edgesIn.sparkSession
    import spark.implicits._

    // The alias graph is dictionary-sized relative to the corpus; a
    // driver-looped fixpoint over it must not pay corpus-grade shuffle
    // widths (32+ tasks per tiny stage dominate wall time). Size the
    // loop's shuffles to the edge count, restore the session conf after.
    val nEdges = edgesIn.count()
    if (nEdges <= localThreshold) return localUnionFind(edgesIn)
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism,
      (nEdges / 100000L).toInt + 1))
    val savedConf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try alternatingLoop(edgesIn, maxIter)
    finally spark.conf.set("spark.sql.shuffle.partitions", savedConf)
  }

  /** Driver-local path-compressed union-find for driver-collectable
    * graphs; canonical_id = lexicographic min of the component (the
    * same contract as the distributed path). */
  private def localUnionFind(edgesIn: DataFrame): DataFrame = {
    val spark = edgesIn.sparkSession
    import spark.implicits._
    val edges = edgesIn.select($"src".cast("string"), $"dst".cast("string"))
      .as[(String, String)].collect()
    val parent = mutable.HashMap.empty[String, String]
    def find(x0: String): String = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // path halving
        x = parent(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // roots chosen as union-by-min above; one more sweep guarantees the
    // lexicographic component min even across merge orders
    val byRoot = parent.keys.toSeq.groupBy(find)
    val rows = byRoot.iterator.flatMap { case (_, members) =>
      val m = members.min
      members.iterator.map(n => (n, m))
    }.toSeq
    spark.createDataset(rows).toDF("entity_id", "canonical_id")
  }

  private def alternatingLoop(edgesIn: DataFrame, maxIter: Int): DataFrame = {
    val spark = edgesIn.sparkSession
    import spark.implicits._

    // Undirected edge set as canonical (hi, lo) pairs, hi > lo; self-loops dropped.
    def canon(df: DataFrame): DataFrame =
      df.select(
          greatest($"src", $"dst").as("u"),
          least($"src", $"dst").as("v"))
        .where($"u" =!= $"v")
        .distinct()

    val nodes = edgesIn.select($"src".as("n"))
      .union(edgesIn.select($"dst".as("n"))).distinct()
      .localCheckpoint(true)

    var edges = canon(edgesIn.select($"src", $"dst")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: for every neighbor pair around u, link strictly-larger
      // neighbors to m(u) = min(N(u) ∪ {u}).
      val und = edges.select($"u".as("a"), $"v".as("b"))
        .union(edges.select($"v".as("a"), $"u".as("b")))
      val m = und.groupBy($"a").agg(min($"b").as("mb"))
        .select($"a", least($"a", $"mb").as("m"))
      val large = canon(
        und.join(m, "a")
          .where($"b" > $"a")
          .select($"b".as("src"), $"m".as("dst")))

      // small-star: link every smaller neighbor v (and u itself) to m(u).
      val und2 = large.select($"u".as("a"), $"v".as("b"))
        .union(large.select($"v".as("a"), $"u".as("b")))
      val m2 = und2.groupBy($"a").agg(min($"b").as("mb"))
        .select($"a", least($"a", $"mb").as("m"))
      val smallNbr = und2.join(m2, "a").where($"b" < $"a")
        .select($"b".as("src"), $"m".as("dst"))
      val selfLink = m2.select($"a".as("src"), $"m".as("dst"))
      val small = canon(smallNbr.union(selfLink))

      val next = small.localCheckpoint(true)
      // fixpoint: edge multiset stable (both are distinct sets ⇒ compare
      // via anti-joins). ONE driver action per round: union the two
      // early-limited anti-joins and ask for a single surviving row.
      converged = next.join(edges, Seq("u", "v"), "left_anti").limit(1)
        .union(edges.join(next, Seq("u", "v"), "left_anti").limit(1))
        .limit(1).isEmpty
      edges = next
      iter += 1
    }

    // At convergence every edge is (member, componentMin).
    val labels = edges.select($"u".as("entity_id"), $"v".as("canonical_id"))
    nodes.join(labels, $"n" === $"entity_id", "left")
      .select($"n".as("entity_id"),
        coalesce($"canonical_id", $"n").as("canonical_id"))
  }

  /** Min-label propagation oracle: O(diameter) rounds. */
  def minLabel(edgesIn: DataFrame, maxIter: Int = 100): DataFrame = {
    val spark = edgesIn.sparkSession
    import spark.implicits._
    val und = edgesIn.select($"src".as("a"), $"dst".as("b"))
      .union(edgesIn.select($"dst".as("a"), $"src".as("b")))
      .where($"a" =!= $"b").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = und.select($"a".as("n")).distinct()
      .select($"n", $"n".as("label")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val prop = und.join(labels, $"b" === $"n")
        .groupBy($"a").agg(min($"label").as("nl"))
      val next = labels.join(prop, $"n" === $"a", "left")
        .select($"n", least($"label", coalesce($"nl", $"label")).as("label"))
        .localCheckpoint(true)
      changed = next.as("x").join(labels.as("y"), $"x.n" === $"y.n")
        .where($"x.label" =!= $"y.label").count()
      labels = next
      iter += 1
    }
    und.unpersist()
    labels.select($"n".as("entity_id"), $"label".as("canonical_id"))
  }
}
