package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Q.{dsum, dsumSql}
import graft.sources.SnapshotStore

/** General relational operator surface (SURVEY.md §2.1–§2.7): scans,
  * projection/filter, the join family (broadcast, SMJ, semi/anti,
  * salted-skew, interval, as-of), aggregation family, windows, sort /
  * top-k / set ops, and the scalar-function groups. Every key has a
  * DuckDB oracle.
  *
  * Scale notes are inline per operator; the common themes:
  *  - filters/projections sit directly on the pinned-schema parquet scan
  *    so pushdown + column pruning reach the reader;
  *  - small sides of joins are broadcast explicitly;
  *  - aggregates are hash aggregates with map-side partial combine;
  *  - window tie-breaks are total orders so results are deterministic
  *    under any partitioning.
  */
object RelationalQueries {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Paths.get("target", "qtmp", name)
    java.nio.file.Files.createDirectories(d.getParent)
    d.toString
  }

  val all: Map[String, Q] = Map(

    // ---------- S: scans / sources ----------
    "scan_parquet" -> Q(
      "SELECT r_regionkey, r_name FROM region")(
      (s, d) => Tables.region(s, d).select("r_regionkey", "r_name")),

    "scan_snapshot" -> Q(
      "SELECT n_nationkey, n_name, n_regionkey FROM nation")(
      (s, d) => {
        // snapshot round-trip: commit `nation` to the Iceberg-emulating
        // store, read it back as-of latest (S2/S3, SURVEY.md §2.1).
        val dir = tmpDir(s"snap-${d.replaceAll("[^a-zA-Z0-9.]", "_")}")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        val store = SnapshotStore.forRoot(dir)
        store.commit(Tables.nation(s, d), stage = "nation", marker = s"nation@$d")
        store.read(s, Some(Tables.nationSchema))
      }),

    "scan_json" -> Q(
      "SELECT n_nationkey, n_name FROM nation")(
      (s, d) => {
        // JSON dictionary-fixture read path (S4): write-once then read
        // with a pinned schema (inference would double-scan at 100 TB).
        val dir = tmpDir(s"json-${d.replaceAll("[^a-zA-Z0-9.]", "_")}")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        Tables.nation(s, d).select("n_nationkey", "n_name")
          .write.mode("overwrite").json(dir)
        s.read.schema("n_nationkey INT, n_name STRING").json(dir)
          .select("n_nationkey", "n_name")
      }),

    // ---------- P: project / filter ----------
    // revenue emitted in integer cents via floor(x*100 + 0.5): bit-exact
    // across engines, unlike round(double, 2) whose half-up tie handling
    // differs between Spark (decimal-string) and DuckDB (binary).
    "project" -> Q(
      """SELECT l_orderkey, l_linenumber,
        |CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS revenue_cents
        |FROM lineitem""".stripMargin)(
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("revenue_cents"))),

    "filter_pred" -> Q(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 45""".stripMargin)(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")),

    // ---------- J: joins ----------
    "join_broadcast" -> Q(
      ("""SELECT p_brand, count(*) AS n_items, """ + dsumSql("l_extendedprice") + """ AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""").stripMargin)(
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))),

    "join_smj" -> Q(
      ("""SELECT o_orderpriority, count(*) AS n_lines, """ + dsumSql("l_extendedprice") + """ AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""").stripMargin)(
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("sum_price"))),

    "join_semi" -> Q(
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin)(
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d).where(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus")),

    "join_anti" -> Q(
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin)(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")),

    "join_salted" -> Q(
      ("""SELECT o_orderstatus, count(*) AS n_lines, """ + dsumSql("l_quantity") + """ AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""").stripMargin)(
      (s, d) => {
        // J5 explicit skew salting (SURVEY.md §2.3): fact side gets a
        // deterministic per-row salt, dim side is replicated K ways, the
        // join key becomes (key, salt) so one hot key spreads over K
        // reducers. Result provably ≡ the plain join (oracle is the
        // plain join). AQE skew splitting stays on as the second line of
        // defense at runtime.
        val K = 8
        val li = Tables.lineitem(s, d).withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(K)).cast("int"))
        val ord = Tables.orders(s, d)
          .withColumn("salt", explode(sequence(lit(0), lit(K - 1))))
        // SHUFFLE_HASH on the replicated dim side (guide §3.1, r6): the
        // salted join previously planned sort-merge, paying a full sort
        // of BOTH sides on (key, salt) on top of the deliberate K×
        // replication. Salting guarantees near-uniform build-side
        // partitions (that is its purpose), which is exactly when a
        // shuffled-hash build is safe — the dim partition is bounded at
        // |orders|·K/parts rows — and the sorts vanish. AQE skew
        // splitting applies to SHJ exactly as to SMJ (second defense).
        li.join(ord.hint("shuffle_hash"),
            li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
      }),

    "join_interval" -> Q(
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.ts < b.ts
        | AND b.ts < a.ts + INTERVAL 10 MINUTE
        |GROUP BY a.user_id""".stripMargin)(
      (s, d) => {
        // J7 theta/interval join: equi part (user_id) drives the shuffle,
        // the range predicate evaluates inside each hash bucket — never a
        // cartesian product (SURVEY.md §2.3).
        val a = Tables.events(s, d).select(
          col("user_id"), col("ts").as("ts_a"))
        val b = Tables.events(s, d).select(
          col("user_id").as("user_b"), col("ts").as("ts_b"))
        a.join(b, col("user_id") === col("user_b") &&
            col("ts_a") < col("ts_b") &&
            col("ts_b") < col("ts_a") + expr("INTERVAL 10 MINUTE"))
          .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
      }),

    "join_asof" -> Q(
      """SELECT e.event_id, e.user_id, max(p.ts) AS prior_purchase_ts
        |FROM events e LEFT JOIN events p
        |  ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts < e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id""".stripMargin)(
      (s, d) => {
        // J8 as-of join, shuffle-once formulation: a single window pass
        // over (user, time) carries the last-prior-purchase timestamp to
        // every row — O(n log n) per partition vs the oracle's
        // O(n²)-per-user join. (user_id, ts) is unique in this data, so
        // the strict `<` oracle ≡ rowsBetween(..., -1).
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .withColumn("prior_purchase_ts",
            max(when(col("event_type") === "purchase", col("ts"))).over(w))
          .where(col("event_type") === "error")
          .select("event_id", "user_id", "prior_purchase_ts")
      }),

    "join_bucketed" -> Q(
      """SELECT l_orderkey, count(*) AS n_items, max(o_totalprice) AS price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY l_orderkey""".stripMargin)(
      (s, d) => {
        // Co-located join via bucketing (task brief: "bucketing for
        // co-located joins"): both tables are materialized bucketed AND
        // sorted on the join key, so the join AND the follow-up groupBy
        // on that key run with ZERO shuffles — the layout investment a
        // 100 TB fact table pays once and amortizes over every join.
        // The in-memory catalog is per-session: first call in a session
        // writes, later calls reuse (Bench's second pass measures the
        // post-layout cost, which is the steady-state number).
        // per-dir AND per-process suffix: the warehouse dir outlives the
        // in-memory catalog, and a concurrent session racing ensure()'s
        // delete-then-CTAS against the same table name could destroy
        // the other's data (ADVICE r2) — the pid keeps names disjoint
        // across processes while staying stable within this session.
        val sfx = java.lang.Long.toHexString(
          java.util.Objects.hashCode(d).toLong & 0xffffffffL) +
          "_p" + ProcessHandle.current().pid()
        val lt = s"lineitem_bkt_$sfx"
        val ot = s"orders_bkt_$sfx"
        // The in-memory catalog forgets tables across sessions but their
        // warehouse dirs persist — clear a leftover location before
        // (re)creating, or CTAS fails with locationAlreadyExists. The
        // per-pid names mean prior PROCESSES' dirs are never reused:
        // sweep stale siblings (same table prefix, pid no longer alive)
        // so repeated bench runs don't accumulate bucketed copies.
        import scala.jdk.CollectionConverters._
        // concurrent sweeps may race each other: deleteIfExists +
        // swallowing NoSuchFileException makes losing the race benign
        // (ADVICE r3)
        def rmTree(p: java.nio.file.Path): Unit =
          try java.nio.file.Files.walk(p).iterator().asScala.toSeq
            .reverse.foreach(q =>
              try java.nio.file.Files.deleteIfExists(q)
              catch { case _: java.nio.file.NoSuchFileException => ()
                      case _: java.nio.file.DirectoryNotEmptyException => () })
          catch { case _: java.nio.file.NoSuchFileException => ()
                  case _: java.io.UncheckedIOException => () }
        def ensure(name: String)(write: => Unit): Unit =
          if (!s.catalog.tableExists(name)) {
            val wh = s.conf.get("spark.sql.warehouse.dir")
            val whDir = java.nio.file.Paths.get(
              if (wh.startsWith("file:")) new java.net.URI(wh).getPath else wh)
            val lname = name.toLowerCase(java.util.Locale.ROOT)
            val prefix = lname.substring(0, lname.lastIndexOf("_p") + 2)
            if (java.nio.file.Files.isDirectory(whDir)) {
              java.nio.file.Files.list(whDir).iterator().asScala
                .filter { p =>
                  val n = p.getFileName.toString
                  // ProcessHandle, not /proc/<pid>: the proc path never
                  // exists on non-Linux hosts or across pid namespaces,
                  // which would call every sibling dead and reintroduce
                  // the cross-process delete race (ADVICE r3)
                  n.startsWith(prefix) && n != lname &&
                    n.substring(prefix.length).toLongOption.exists(pid =>
                      !ProcessHandle.of(pid)
                        .map[Boolean](_.isAlive).orElse(false))
                }.toSeq.foreach(rmTree)
            }
            val loc = whDir.resolve(lname)
            if (java.nio.file.Files.exists(loc)) rmTree(loc)
            write
          }
        ensure(lt)(Tables.lineitem(s, d).write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt))
        ensure(ot)(Tables.orders(s, d).write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot))
        // hint("merge"): at fixture scale Catalyst would broadcast the
        // tiny orders side, which hides exactly the property this key
        // exists to prove — that the bucketed layout joins AND
        // aggregates with zero shuffles. At 100 TB neither side is
        // broadcastable and SMJ is what the planner picks anyway.
        s.table(ot).hint("merge")
          .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_items"), max(col("o_totalprice")).as("price"))
      }),

    // ---------- A: aggregations ----------
    "agg_hash" -> Q(
      ("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        |""" + dsumSql("l_quantity") + """ AS sum_qty,
        |""" + dsumSql("l_extendedprice") + """ AS sum_price,
        |""" + dsumSql("l_discount") + """ / count(*) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""").stripMargin)(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"))),

    "agg_distinct" -> Q(
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"))),

    "agg_approx_distinct" -> Q(
      """SELECT l_linestatus, count(DISTINCT l_orderkey) AS n_exact,
        |  abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
        |    <= 0.1 * count(DISTINCT l_orderkey) AS approx_ok
        |FROM lineitem GROUP BY l_linestatus""".stripMargin)(
      (s, d) => {
        // A3: HLL++ sketch vs exact — emitted as a bounded-error witness
        // because the two engines' sketches differ; the bound (±10%) is
        // far outside both implementations' rsd.
        Tables.lineitem(s, d)
          .groupBy("l_linestatus")
          .agg(countDistinct(col("l_orderkey")).as("n_exact"),
            (abs(approx_count_distinct(col("l_orderkey")) - countDistinct(col("l_orderkey")))
              <= lit(0.1) * countDistinct(col("l_orderkey"))).as("approx_ok"))
      }),

    "agg_argmax" -> Q(
      """WITH m AS (SELECT l_returnflag, max(l_extendedprice) AS max_price
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT m.l_returnflag, m.max_price,
        |  (SELECT max(l_partkey) FROM lineitem li
        |   WHERE li.l_returnflag = m.l_returnflag
        |     AND li.l_extendedprice = m.max_price) AS argmax_partkey
        |FROM m""".stripMargin)(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(max(struct(col("l_extendedprice").as("p"), col("l_partkey").as("k"))).as("m"))
        .select(col("l_returnflag"), col("m.p").as("max_price"),
          col("m.k").as("argmax_partkey"))),

    "agg_rollup" -> Q(
      ("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        |""" + dsumSql("l_quantity") + """ AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""").stripMargin)(
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))),

    "agg_cube" -> Q(
      ("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        |""" + dsumSql("l_quantity") + """ AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""").stripMargin)(
      (s, d) => Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))),

    "agg_grouping_sets" -> Q(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)(
      (s, d) => {
        // A5: grouping sets are SQL-only in Spark's surface — register
        // the scan as a temp view and go through spark.sql.
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gsets")
        s.sql(
          """SELECT l_returnflag, l_linestatus, count(*) AS n
            |FROM lineitem_gsets
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
      }),

    "agg_collect" -> Q(
      """SELECT l_orderkey,
        |  string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin)(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(array_join(
          transform(array_sort(collect_list(col("l_linenumber"))),
            x => x.cast("string")), ",").as("lines"))),

    "agg_median" -> Q(
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)(
      (s, d) =>
        // A: exact continuous median (sort-based percentile — the exact
        // baseline next to A3's HLL sketch; at corpus scale you'd reach
        // for approx_percentile, but the EXACT form is what an oracle
        // can replay). Parity holds because l_quantity is integer-valued
        // in this data: the 0.5-interpolation midpoint (a+b)/2 is exact
        // in both engines' double arithmetic.
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(percentile(col("l_quantity"), lit(0.5)).as("med_qty"),
            count(lit(1)).as("n"))),

    "pivot" -> Q(
      """SELECT l_returnflag,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
         |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F",
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
         |       FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O"
         |FROM lineitem GROUP BY l_returnflag""".stripMargin)(
      (s, d) =>
        // Long-to-wide pivot with an EXPLICIT value list: without it
        // Spark runs an extra distinct-values job over the whole table
        // just to name the columns — never acceptable at scale. With
        // the list this is one hash agg (grouping key × value set
        // folded map-side), no extra pass.
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(dsum(col("l_quantity")))),

    "unpivot" -> Q(
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part""".stripMargin)(
      (s, d) =>
        // Wide-to-long unpivot (melt): a pure per-row Expand — no
        // shuffle, stays inside whole-stage codegen; the scan prunes to
        // exactly the id + value columns.
        Tables.part(s, d)
          .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
            col("p_retailprice"))
          .unpivot(Array(col("p_partkey")),
            Array(col("p_size"), col("p_retailprice")), "metric", "val")),

    // ---------- W: windows ----------
    "win_rank" -> Q(
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin)(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      }),

    "win_laglead" -> Q(
      """SELECT event_id, user_id,
        |  lag(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events""".stripMargin)(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
      }),

    "win_frame" -> Q(
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin)(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .over(w).cast("double").as("running_value"))
      }),

    "win_overlap" -> Q(
      """SELECT grp, begin_pos, end_pos, l_orderkey, l_linenumber FROM (
        |  SELECT grp, begin_pos, end_pos, l_orderkey, l_linenumber,
        |    max(end_pos) OVER (PARTITION BY grp
        |      ORDER BY begin_pos, end_pos DESC, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
        |  FROM (SELECT l_suppkey AS grp,
        |               CAST(l_partkey % 50 AS BIGINT) AS begin_pos,
        |               CAST(l_partkey % 50 + CAST(l_quantity AS BIGINT) % 7 + 1 AS BIGINT) AS end_pos,
        |               l_orderkey, l_linenumber FROM lineitem))
        |WHERE prev_max_end IS NULL OR begin_pos >= prev_max_end""".stripMargin)(
      (s, d) => {
        // W4 longest-match overlap suppression without the O(n²) interval
        // self-join (SURVEY.md §2.5): one window pass with a running max.
        val iv = Tables.lineitem(s, d).select(
          col("l_suppkey").as("grp"),
          (col("l_partkey") % 50).as("begin_pos"),
          (col("l_partkey") % 50 + col("l_quantity").cast("long") % 7 + 1).as("end_pos"),
          col("l_orderkey"), col("l_linenumber"))
        val w = Window.partitionBy("grp")
          .orderBy(col("begin_pos"), col("end_pos").desc, col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, -1)
        iv.withColumn("prev_max_end", max(col("end_pos")).over(w))
          .where(col("prev_max_end").isNull || col("begin_pos") >= col("prev_max_end"))
          .select("grp", "begin_pos", "end_pos", "l_orderkey", "l_linenumber")
      }),

    "win_ntile" -> Q(
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS bucket4,
        |  percent_rank() OVER w AS p_rank,
        |  cume_dist() OVER w AS c_dist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin)(
      (s, d) => {
        // W: distribution window functions. The order key is a TOTAL
        // order (price, then key), so percent_rank/cume_dist are single
        // exact integer ratios — deterministic doubles both engines.
        // Spark's ntile is IntegerType; cast to DuckDB's BIGINT.
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).cast("long").as("bucket4"),
          percent_rank().over(w).as("p_rank"),
          cume_dist().over(w).as("c_dist"))
      }),

    // ---------- O: sort / top-k / set ops ----------
    "sort_global" -> Q(
      """SELECT c_nationkey, count(*) AS n_cust FROM customer
        |GROUP BY c_nationkey ORDER BY n_cust DESC, c_nationkey""".stripMargin)(
      (s, d) => Tables.customer(s, d)
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
        .orderBy(col("n_cust").desc, col("c_nationkey"))),

    "topk" -> Q(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)(
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")),

    "set_union" -> Q(
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin)(
      (s, d) => {
        val o = Tables.orders(s, d)
        o.where(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
          .union(o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
          .distinct()
      }),

    "set_intersect" -> Q(
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin)(
      (s, d) => {
        val o = Tables.orders(s, d)
        o.where(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
          .intersect(o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
      }),

    "set_except" -> Q(
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin)(
      (s, d) => {
        val o = Tables.orders(s, d)
        o.where(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
          .except(o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
      }),

    "dedup" -> Q(
      "SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem")(
      (s, d) => Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .dropDuplicates()),

    // ---------- F: scalar function groups ----------
    "fn_string" -> Q(
      """SELECT p_partkey, lower(p_name) AS name_lc,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
        |  substring(p_brand, 1, 7) AS brand7,
        |  translate(p_name, 'ae', 'xy') AS name_tr,
        |  levenshtein(p_brand, 'Brand#11') AS lev
        |FROM part""".stripMargin)(
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"), lower(col("p_name")).as("name_lc"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"),
        substring(col("p_brand"), 1, 7).as("brand7"),
        translate(col("p_name"), "ae", "xy").as("name_tr"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("lev"))),

    "fn_math" -> Q(
      """SELECT p_partkey, abs(p_size - 25) AS size_dev, sqrt(p_retailprice) AS price_sqrt,
        |  CAST(floor(p_retailprice) AS DOUBLE) AS price_floor,
        |  CAST(ceil(p_retailprice) AS DOUBLE) AS price_ceil,
        |  p_partkey % 7 AS key_mod,
        |  CAST(floor(p_retailprice * 10 + 0.5) AS BIGINT) AS price_deci
        |FROM part""".stripMargin)(
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"), abs(col("p_size") - 25).as("size_dev"),
        sqrt(col("p_retailprice")).as("price_sqrt"),
        floor(col("p_retailprice")).cast("double").as("price_floor"),
        ceil(col("p_retailprice")).cast("double").as("price_ceil"),
        pmod(col("p_partkey"), lit(7)).as("key_mod"),
        floor(col("p_retailprice") * 10 + 0.5).cast("long").as("price_deci"))),

    "fn_date" -> Q(
      """SELECT event_id, date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hour_ts,
        |  CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
        |  CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec
        |FROM events""".stripMargin)(
      (s, d) => Tables.events(s, d).select(
        col("event_id"), date_trunc("day", col("ts")).as("day"),
        date_trunc("hour", col("ts")).as("hour_ts"),
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofweek(col("ts")).as("dow"),
        unix_timestamp(col("ts")).as("unix_sec"))),

    "fn_array" -> Q(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(len(generate_series(1, CAST(l_linenumber AS BIGINT))) AS INT) AS n_elems,
        |  CAST(list_sum(list_transform(generate_series(1, CAST(l_linenumber AS BIGINT)),
        |       x -> x * x)) AS BIGINT) AS sq_sum,
        |  len(list_filter(generate_series(1, CAST(l_linenumber AS BIGINT)),
        |       x -> x % 2 = 0)) > 0 AS has_even,
        |  array_to_string(generate_series(1, CAST(l_linenumber AS BIGINT)), ',') AS arr_str
        |FROM lineitem""".stripMargin)(
      (s, d) => {
        // F4 higher-order array functions — no UDF (SURVEY §2.7). The
        // generated array is built ONCE in its own projection (r6):
        // higher-order functions are CodegenFallback, so the inlined
        // `sequence` subtree was re-evaluated inside each of the four
        // consumers with no cross-expression CSE; the explicit
        // intermediate survives CollapseProject (non-cheap expression
        // referenced 4×) and measured 0.61→0.55 s steady-state /
        // 1.36→0.74 s cold at sf0.1 in an in-process A/B. Output
        // columns and values are unchanged.
        Tables.lineitem(s, d)
          .withColumn("seq0", sequence(lit(1L), col("l_linenumber").cast("long")))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            size(col("seq0")).as("n_elems"),
            aggregate(transform(col("seq0"), x => x * x), lit(0L), (a, x) => a + x).as("sq_sum"),
            exists(col("seq0"), x => x % 2 === 0).as("has_even"),
            array_join(transform(col("seq0"), x => x.cast("string")), ",").as("arr_str"))
      }),

    "fn_map" -> Q(
      """SELECT user_id,
        |  NULLIF(count(*) FILTER (WHERE event_type = 'error'), 0) AS n_errors
        |FROM events GROUP BY user_id""".stripMargin)(
      (s, d) => {
        // F5: build a per-user map<type,count> with map_from_entries and
        // probe it — absent key ⇒ NULL (oracle mirrors with NULLIF).
        Tables.events(s, d)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
          .groupBy("user_id")
          .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
          .select(col("user_id"), try_element_at(col("m"), lit("error")).as("n_errors"))
      }),

    "fn_json" -> Q(
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_val FROM events""")(
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val")))
  )
}
