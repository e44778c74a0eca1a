package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** Snapshot/lineage semantics (SURVEY.md §5.2): atomic append, as-of
  * reads, marker idempotence, crash-resume exactly-once:
  * commit(A) + crash + resume + commit(B) ≡ commit(A ∪ B). */
class SnapshotStoreSpec extends SparkSuite {

  private def freshStore(): (SnapshotStore, String) = {
    val dir = Files.createTempDirectory("snapstore").toString
    (SnapshotStore.forRoot(dir), dir)
  }

  test("append commits, as-of reads, lineage") {
    import spark.implicits._
    val (store, _) = freshStore()
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b = Seq((3L, "c")).toDF("k", "v")
    assert(store.commit(a, "stage1", "m1") == Some(1L))
    assert(store.commit(b, "stage2", "m2") == Some(2L))

    assert(store.read(spark).count() == 3)
    assert(store.read(spark, asOf = Some(1L)).count() == 2)
    assert(store.read(spark, stage = Some("stage2")).count() == 1)

    val lin = store.lineage(spark).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(lin.toSet == Set((1L, "stage1", 2L), (2L, "stage2", 1L)))
  }

  test("marker idempotence: replaying a commit is a no-op") {
    import spark.implicits._
    val (store, _) = freshStore()
    val a = Seq((1L, "a")).toDF("k", "v")
    assert(store.commit(a, "s", "batch-0").isDefined)
    assert(store.commit(a, "s", "batch-0").isEmpty) // replay
    assert(store.read(spark).count() == 1)
    assert(store.manifests().size == 1)
  }

  test("commitBuckets: one write job, per-bucket lineage, empty buckets marker-only, replay no-op") {
    import spark.implicits._
    val (store, _) = freshStore()
    val df = Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1)).toDF("k", "v", "bucket")
    val ids = store.commitBuckets(df, "s", "bucket", Seq(0, 1, 2), b => s"s-b$b",
      statsCol = Some("k"))
    assert(ids.size == 3)
    assert(store.markers() == Set("s-b0", "s-b1", "s-b2"))
    val ms = store.manifests()
    // observe-counted per-bucket rows; bucket 2 has no data at all
    assert(ms.map(m => m.metrics("bucket") -> m.rows).toMap ==
      Map(0L -> 2L, 1L -> 1L, 2L -> 0L))
    // per-bucket source ranges from the same observe; empty bucket → none
    val ranges = ms.map(m => m.metrics("bucket") ->
      (m.metrics.get("min_k"), m.metrics.get("max_k"))).toMap
    assert(ranges(0L) == (Some(1L), Some(2L)))
    assert(ranges(1L) == (Some(3L), Some(3L)))
    assert(ranges(2L) == (None, None))
    // one write job → all manifests share one snap-N parent dir
    assert(ms.map(m => java.nio.file.Paths.get(m.dir).getParent).toSet.size == 1)
    // read skips the empty bucket; bucket is a path, not a data column
    val rd = store.read(spark, stage = Some("s"))
    assert(rd.columns.toSet == Set("k", "v") && rd.count() == 3)
    // replay: committed buckets are filtered out driver-side
    assert(store.commitBuckets(df, "s", "bucket", Seq(0, 1, 2), b => s"s-b$b").isEmpty)
  }

  test("additive schema evolution: later commits add columns, old rows read null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (store, _) = freshStore()
    store.commit(Seq((1L, "a")).toDF("k", "v"), "s", "m1")
    store.commit(Seq((2L, "b", 9.5)).toDF("k", "v", "w"), "s", "m2")
    val evolved = store.read(spark, evolveSchema = true)
    assert(evolved.columns.toSet == Set("k", "v", "w"))
    val byK = evolved.collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(byK(1L) && !byK(2L)) // pre-evolution rows serve null for w
    // time travel still serves the old schema as-of the old snapshot
    assert(store.read(spark, asOf = Some(1L), evolveSchema = true)
      .columns.toSet == Set("k", "v"))
  }

  test("manifest column stats prune whole snapshots at planning time") {
    import spark.implicits._
    val (store, _) = freshStore()
    // three time-ranged commits, like daily ingests
    store.commit(Seq((10L, "a"), (19L, "b")).toDF("ts", "v"), "s", "d1",
      statsCols = Seq("ts"))
    store.commit(Seq((20L, "c"), (29L, "d")).toDF("ts", "v"), "s", "d2",
      statsCols = Seq("ts"))
    store.commit(Seq((30L, "e")).toDF("ts", "v"), "s", "d3",
      statsCols = Seq("ts"))
    // stats recorded in the manifests (observed during the write job)
    val m1 = store.manifests().head
    assert(m1.metrics("min_ts") == 10L && m1.metrics("max_ts") == 19L)

    // planning-time pruning: only the overlapping snapshot's dir is read
    val pruned = store.readPruned(spark, "ts", 20L, 25L, stage = Some("s"))
    val scannedDirs = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scannedDirs.size == 1 && scannedDirs.head.contains("snap-2"))
    assert(pruned.collect().map(_.getString(1)).toSet == Set("c"))

    // conservative: a snapshot without stats is never pruned away
    store.commit(Seq((21L, "x")).toDF("ts", "v"), "s", "d4") // no statsCols
    assert(store.readPruned(spark, "ts", 20L, 25L, stage = Some("s"))
      .collect().map(_.getString(1)).toSet == Set("c", "x"))

    // fully disjoint range → empty result, correct schema, zero data dirs
    val none = store.readPruned(spark, "ts", 100L, 200L, stage = Some("s"))
    assert(none.columns.toSet == Set("ts", "v") && none.count() == 0)

    // non-numeric stat column: ANSI cast would throw mid-write —
    // try_cast degrades to absent stats, commit + reads still work
    store.commit(Seq((40L, "w")).toDF("ts", "v"), "s2", "d5",
      statsCols = Seq("v"))
    val m5 = store.manifests().last
    assert(!m5.metrics.contains("min_v") && !m5.metrics.contains("max_v"))
    assert(store.readPruned(spark, "v", 0L, 10L, stage = Some("s2")).count() == 0)
  }

  test("hidden partitioning: transform laid out + pruned, never served") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (store, _) = freshStore()
    val events = Seq((86400L * 0 + 10, "a"), (86400L * 1 + 20, "b"),
      (86400L * 2 + 30, "c")).toDF("ts", "v")
    store.commit(events, "ev", "m1",
      hiddenPartitions = Seq("day" -> (col("ts").cast("long") / 86400L).cast("long")))
    // layout: hive dirs per day under the snapshot
    val m = store.manifests().head
    assert(m.hidden == Seq("day"))
    val dayDirs = java.nio.file.Files.list(java.nio.file.Paths.get(m.dir))
      .iterator()
    val names = scala.jdk.javaapi.CollectionConverters.asScala(dayDirs)
      .map(_.getFileName.toString).filter(_.startsWith("day=")).toSet
    assert(names == Set("day=0", "day=1", "day=2"))
    // default read serves the ORIGINAL schema (transform invisible)
    val rd = store.read(spark, stage = Some("ev"))
    assert(rd.columns.toSet == Set("ts", "v") && rd.count() == 3)
    // opting in: a filter on the hidden column prunes partition dirs
    val pruned = store.read(spark, stage = Some("ev"), keepHidden = true)
      .where(col("day") === 1L)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("day"), scan.metadata)
    assert(pruned.collect().map(_.getString(1)).toSeq == Seq("b"))
  }

  test("SQL VERSION AS OF time travel through the V2 catalog") {
    import spark.implicits._
    val (store, dir) = freshStore()
    store.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "ev", "m1")
    store.commit(Seq((3L, "c")).toDF("k", "v"), "ev", "m2")
    store.commit(Seq((9L, "z")).toDF("k", "v"), "other", "m3")

    val cat = s"snap${math.abs(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)

    // stage = table; latest read sees both ev commits, none of 'other'
    assert(spark.sql(s"SELECT * FROM $cat.ev").count() == 3)
    assert(spark.sql(s"SELECT v FROM $cat.other").collect().map(_.getString(0)).toSeq == Seq("z"))
    // Spark's native time-travel syntax resolves snapshot ids
    assert(spark.sql(s"SELECT * FROM $cat.ev VERSION AS OF 1").count() == 2)
    assert(spark.sql(s"SELECT * FROM $cat.ev VERSION AS OF 2").count() == 3)
    assert(spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet == Set("ev", "other"))
    // predicate pushdown survives the catalog: filters reach the scan
    val plan = spark.sql(s"SELECT * FROM $cat.ev WHERE k = 3").queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,3)]"), plan.take(900))

    // the SQL surface serves the LIVE set after compaction — same rule
    // as SnapshotStore.read: no double rows, and VERSION AS OF below
    // the compaction id still sees the original history
    store.compact(spark, "ev")
    assert(spark.sql(s"SELECT * FROM $cat.ev").count() == 3)
    assert(spark.sql(s"SELECT * FROM $cat.ev VERSION AS OF 1").count() == 2)
  }

  test("crash-resume exactly-once: data without manifest is invisible; resume completes") {
    import spark.implicits._
    val (store, dir) = freshStore()
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    store.commit(a, "s", "mA")

    // simulate a crash mid-commit: parquet written, manifest never renamed
    val orphan = java.nio.file.Paths.get(dir, "data", "snap-99")
    Seq((99L, "junk")).toDF("k", "v").write.parquet(orphan.toString)
    assert(store.read(spark).count() == 2) // orphan invisible
    assert(store.latestId == Some(1L))

    // resume: driver consults markers() and re-runs only missing stages
    val done = store.markers()
    assert(done.contains("mA") && !done.contains("mB"))
    val b = Seq((3L, "c")).toDF("k", "v")
    if (!done.contains("mB")) store.commit(b, "s", "mB")
    assert(store.read(spark).count() == 3) // ≡ commit(A ∪ B), exactly once
  }

  test("SQL INSERT INTO commits an atomic snapshot; identical replay is a no-op") {
    import spark.implicits._
    val (store, dir) = freshStore()
    store.commit(Seq((1L, "a")).toDF("k", "v"), "ev", "m1")

    val cat = s"snapw${math.abs(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)

    // first insert: a new snapshot, visible to latest reads
    spark.sql(s"INSERT INTO $cat.ev VALUES (2, 'b'), (3, 'c')")
    assert(store.manifests().size == 2)
    assert(spark.sql(s"SELECT * FROM $cat.ev").count() == 3)

    // the IDENTICAL statement replayed: semantic-hash marker makes it
    // a no-op — exactly-once at the snapshot level, surfaced in SQL
    spark.sql(s"INSERT INTO $cat.ev VALUES (2, 'b'), (3, 'c')")
    assert(store.manifests().size == 2)
    assert(spark.sql(s"SELECT * FROM $cat.ev").count() == 3)

    // a semantically different insert commits a new snapshot...
    spark.sql(s"INSERT INTO $cat.ev VALUES (4, 'd')")
    assert(store.manifests().size == 3)
    // ...and the log stays time-travelable across the SQL commits
    assert(spark.sql(s"SELECT * FROM $cat.ev VERSION AS OF 2").count() == 3)
    assert(spark.sql(s"SELECT * FROM $cat.ev").count() == 4)
    // programmatic and SQL reads agree (one store, one snapshot log)
    assert(store.read(spark, stage = Some("ev")).count() == 4)

    // escape hatch (ADVICE r4): a user who MEANS to append an
    // identical literal row again can switch the digest no-op off
    spark.conf.set("spark.graft.sql.dedupLiteralInserts", "false")
    try {
      spark.sql(s"INSERT INTO $cat.ev VALUES (4, 'd')")
      assert(spark.sql(s"SELECT * FROM $cat.ev").count() == 5)
    } finally spark.conf.unset("spark.graft.sql.dedupLiteralInserts")
  }

  test("SQL INSERT replicates the stage's partition layout; hidden stages rejected; source-reading inserts append") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (store, dir) = freshStore()
    store.commit(
      Seq(("E1", "hasType", "PER"), ("E2", "mentionedIn", "doc:1"))
        .toDF("subj", "pred", "obj"),
      "triples", "m1", partitionBy = Seq("pred"))

    val cat = s"snapp${math.abs(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)

    // hive layout puts partition columns LAST in the served schema
    assert(spark.table(s"$cat.triples").columns.toSeq == Seq("subj", "obj", "pred"))
    spark.sql(s"INSERT INTO $cat.triples VALUES ('E3', 'doc:9', 'mentionedIn')")
    val m2 = store.manifests().last
    assert(m2.parts == Seq("pred"), m2)
    // the inserted snapshot's files live in the stage's shared hive
    // tree under their pred= dir — NOT a flat dir that would poison
    // partition discovery — and carry the snapshot id in their names
    assert(m2.files.nonEmpty &&
      m2.files.forall(f => f.contains("/pred=mentionedIn/") &&
        f.contains(s"snap-${m2.id}-")), m2.files)
    // both read paths keep working across old + inserted snapshots
    assert(spark.sql(s"SELECT * FROM $cat.triples").count() == 3)
    assert(store.read(spark, stage = Some("triples")).count() == 3)
    assert(spark.sql(
      s"SELECT subj FROM $cat.triples WHERE pred = 'mentionedIn' ORDER BY subj")
      .collect().map(_.getString(0)).toSeq == Seq("E2", "E3"))

    // hidden-partition stage (r5): the commit records the transform's
    // SQL, so INSERT REPLAYS the layout — the append lands in the
    // stage's hive tree under its computed day= dir, and the logical
    // surface never sees the layout column
    store.commit(Seq((86410L, "a")).toDF("ts", "v"), "ev", "mh",
      hiddenPartitions = Seq("day" -> (col("ts").cast("long") / 86400L).cast("long")))
    spark.sql(s"INSERT INTO $cat.ev VALUES (5, 'x')")
    val mh = store.manifests().last
    assert(mh.hidden == Seq("day") && mh.hiddenExprs.nonEmpty, mh)
    assert(mh.files.nonEmpty && mh.files.forall(_.contains("/day=0/")), mh.files)
    assert(spark.sql(s"SELECT * FROM $cat.ev").columns.toSeq == Seq("ts", "v"))
    assert(spark.sql(s"SELECT * FROM $cat.ev").count() == 2)
    assert(store.read(spark, stage = Some("ev")).count() == 2)

    // pre-r5 manifest (hidden recorded WITHOUT transform SQL): the
    // transform isn't reconstructible — INSERT must still be refused,
    // not silently mislaid
    val oldDir = java.nio.file.Paths.get(dir, "data", "snap-old")
    Seq((86410L, "a")).toDF("ts", "v")
      .withColumn("day", (col("ts") / 86400L).cast("long"))
      .write.partitionBy("day").parquet(oldDir.toString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_snapshots", s"${store.latestId.get + 1}.json"),
      s"""{"id":${store.latestId.get + 1},"dir":"$oldDir","stage":"evold","marker":"mo","rows":1,"wall_ms":1,"hidden":["day"],"metrics":{}}""")
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.evold VALUES (5, 'x')"))
    // must be THE pre-r5 guard, not any incidental failure
    assert(e.getMessage.contains("recorded without replayable transform SQL"),
      s"expected the pre-r5 hidden-manifest reject, got: ${e.getMessage}")

    // a source-reading insert (not literal-only) APPENDS on every run:
    // plan-equality is not data-equality for external inputs
    store.commit(Seq((1L, "s")).toDF("k", "v"), "src", "ms")
    store.commit(Seq((0L, "z")).toDF("k", "v"), "dst", "md")
    val before = store.manifests().size
    spark.sql(s"INSERT INTO $cat.dst SELECT * FROM $cat.src")
    spark.sql(s"INSERT INTO $cat.dst SELECT * FROM $cat.src")
    assert(store.manifests().size == before + 2)
    assert(spark.sql(s"SELECT * FROM $cat.dst").count() == 3)

    // time-dependent literals also append every run: current_date()
    // over a literal leaf canonicalizes identically across days, so
    // deduping it would silently drop tomorrow's row
    store.commit(Seq(("seed", "2020-01-01")).toDF("v", "d"), "log", "ml")
    spark.sql(s"INSERT INTO $cat.log VALUES ('deploy', CAST(current_date() AS STRING))")
    spark.sql(s"INSERT INTO $cat.log VALUES ('deploy', CAST(current_date() AS STRING))")
    assert(spark.sql(s"SELECT * FROM $cat.log").count() == 3)

    // env-dependent niladics append every run too (ADVICE r4): the
    // same statement run by a DIFFERENT user inserts different data,
    // so deduping on plan equality would silently lose rows — the
    // childless-non-literal guard fails safe without naming the fn
    spark.sql(s"INSERT INTO $cat.log VALUES ('who', current_user())")
    spark.sql(s"INSERT INTO $cat.log VALUES ('who', current_user())")
    assert(spark.sql(s"SELECT * FROM $cat.log").count() == 5)
  }

  test("stage names ending in the SQL layout suffix are refused at commit") {
    import spark.implicits._
    val (store, _) = freshStore()
    val df = Seq((1L, "a")).toDF("k", "v")
    // such a stage would be unreachable via SQL: `ev$layout` parses as
    // the physical view of stage `ev` — refuse where the mistake is made
    val e = intercept[IllegalArgumentException](store.commit(df, "ev$layout", "m"))
    assert(e.getMessage.contains("reserved"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      store.commitBuckets(df.withColumn("b", org.apache.spark.sql.functions.lit(0)),
        "x$layout", "b", Seq(0), i => s"b$i"))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("migrateLegacyPartitioned does not count externally-wiped snapshots") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (store, dir) = freshStore()
    // hand-write a legacy (pre-file-manifest) partitioned snapshot whose
    // data dir never existed — the tolerated externally-wiped state
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "_snapshots"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_snapshots", "1.json"),
      s"""{"id":1,"dir":"$dir/data/gone","stage":"w","marker":"m1","rows":1,"wall_ms":1,"hidden":[],"parts":["p"],"files":[],"metrics":{}}""")
    assert(store.migrateLegacyPartitioned("w") == 0) // nothing relocated
    // a real legacy snapshot beside it still migrates and counts
    val oldDir = java.nio.file.Paths.get(dir, "data", "snap-legacy-w")
    Seq(("a", "p1")).toDF("v", "p").write.partitionBy("p").parquet(oldDir.toString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_snapshots", "2.json"),
      s"""{"id":2,"dir":"$oldDir","stage":"w","marker":"m2","rows":1,"wall_ms":1,"hidden":[],"parts":["p"],"files":[],"metrics":{}}""")
    assert(store.migrateLegacyPartitioned("w") == 1)
    assert(store.read(spark, stage = Some("w"), marker = Some("m2"))
      .where(col("p") === "p1").count() == 1)
  }

  test("a duplicate snapshot id fails loudly and never clobbers the committed manifest") {
    import spark.implicits._
    val (store, dir) = freshStore()
    store.commit(Seq((1L, "a")).toDF("k", "v"), "t", "m1")
    val committed = store.manifests().last
    // simulate the cross-process racer the contract guards against:
    // another JVM computed the same next id and writes its manifest.
    // POSIX rename(2) silently REPLACES, so an ATOMIC_MOVE-based commit
    // would clobber `committed` here — the claim must be link-based
    // (exclusive) to fail loudly instead (r5 review)
    val racer = committed.copy(marker = "racer", rows = 999L)
    val e = intercept[IllegalStateException](store.writeManifest(racer))
    assert(e.getMessage.contains("already committed"), e.getMessage)
    assert(store.manifests().last == committed) // intact, not clobbered
    // the loser's temp file is cleaned up, not left as a dot orphan
    val snaps = java.nio.file.Paths.get(dir).resolve("_snapshots")
    val st = Files.list(snaps)
    val names = try st.toArray.map(_.toString.split('/').last) finally st.close()
    assert(!names.exists(_.startsWith(".")), names.mkString(","))
  }

  test("orphan temp manifest files never brick the store") {
    import spark.implicits._
    val (store, dir) = freshStore()
    store.commit(Seq((1L, "a")).toDF("k", "v"), "s", "m1")
    // a crash between createTempFile and the atomic move leaves a
    // dot-prefixed orphan; it must be invisible to every store call
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_snapshots", ".tmp-2dead.json"),
      Array.emptyByteArray)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_snapshots", ".tmp-2dead.tmp"),
      "half-writ".getBytes)
    assert(store.manifests().size == 1)
    assert(store.commit(Seq((2L, "b")).toDF("k", "v"), "s", "m2") == Some(2L))
    assert(store.read(spark, stage = Some("s")).count() == 2)
  }

  test("migrate skips a legacy dir whose parquet files were wiped") {
    import spark.implicits._
    val (store, dir) = freshStore()
    // healthy file-granular snapshot in the shared tree first
    store.commit(Seq(("a", "p1")).toDF("v", "p"), "g", "m1", partitionBy = Seq("p"))
    // legacy manifest whose dir EXISTS but holds no parquet files —
    // rewriting it would re-classify it over the whole shared tree
    val hollow = java.nio.file.Paths.get(dir, "data", "snap-hollow")
    java.nio.file.Files.createDirectories(hollow)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_snapshots", "99.json"),
      s"""{"id":99,"dir":"$hollow","stage":"g","marker":"mh","rows":1,"wall_ms":1,"hidden":[],"parts":["p"],"files":[],"metrics":{}}""")
    assert(store.migrateLegacyPartitioned("g") == 0)
    // the healthy snapshot still serves exactly once (no double-serve)
    assert(store.read(spark, stage = Some("g"), marker = Some("m1")).count() == 1)
  }

  test("cached store instance survives an external wipe of its directories") {
    import spark.implicits._
    val (store, dir) = freshStore()
    store.commit(Seq((1L, "a")).toDF("k", "v"), "s", "m1")
    assert(store.manifests().size == 1)
    // a fixture (e.g. a bench pass) deletes the whole store dir while
    // the JVM-cached forRoot instance lives on: a missing _snapshots
    // dir is an EMPTY store, and the next commit recreates the layout
    // — before this fix, manifests() threw NoSuchFileException and a
    // multi-pass bench recorded bogus fast-fail times
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    assert(store.manifests().isEmpty)
    assert(store.commit(Seq((2L, "b")).toDF("k", "v"), "s", "m1") == Some(1L))
    assert(store.read(spark).collect().map(_.getString(1)).toSeq == Seq("b"))
  }

  test("pre-file-manifest partitioned snapshots (legacy layout) still serve their rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (store, dir) = freshStore()
    // hand-craft a pre-r4 manifest: partitioned data in its OWN
    // snap-<id> dir, layout recorded, NO files list — the upgrade must
    // keep reading it (durable stores survive code upgrades)
    val legacyDir = java.nio.file.Paths.get(dir, "data", "snap-1")
    Seq((86410L, "a"), (86400L * 2 + 5, "b")).toDF("ts", "v")
      .withColumn("day", (col("ts") / 86400L).cast("long"))
      .write.partitionBy("day").parquet(legacyDir.toString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_snapshots", "1.json"),
      s"""{"id":1,"dir":"$legacyDir","stage":"ev","marker":"m1","rows":2,"wall_ms":1,"hidden":["day"],"metrics":{}}""")
    // plus a NEW-format partitioned commit on the same stage
    store.commit(Seq((86400L * 3 + 9, "c")).toDF("ts", "v"), "ev", "m2",
      hiddenPartitions = Seq("day" -> (col("ts") / 86400L).cast("long")))
    val rd = store.read(spark, stage = Some("ev"))
    assert(rd.columns.toSet == Set("ts", "v"), rd.columns.toSeq)
    assert(rd.collect().map(_.getString(1)).toSet == Set("a", "b", "c"))
    assert(store.read(spark, stage = Some("ev"), asOf = Some(1L)).count() == 2)
  }

  test("two same-spec legacy partitioned snapshots serve as one SQL scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (store, dir) = freshStore()
    def legacy(id: Int, rows: Seq[(Long, String)], marker: String): Unit = {
      val d = java.nio.file.Paths.get(dir, "data", s"snap-$id")
      rows.toDF("ts", "v").withColumn("day", (col("ts") / 86400L).cast("long"))
        .write.partitionBy("day").parquet(d.toString)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "_snapshots", s"$id.json"),
        s"""{"id":$id,"dir":"$d","stage":"ev","marker":"$marker","rows":${rows.size},"wall_ms":1,"hidden":["day"],"metrics":{}}""")
    }
    legacy(1, Seq((10L, "a"), (86405L, "b")), "m1")
    legacy(2, Seq((86400L * 2 + 3, "c")), "m2")
    // programmatic read always worked: one single-root scan per legacy
    // dir, unioned (Spark cannot union several partitioned ROOTS in
    // one scan — re-verified this round: the multi-path form throws
    // CONFLICTING_DIRECTORY_STRUCTURES even with identical specs)
    assert(store.read(spark, stage = Some("ev"))
      .collect().map(_.getString(1)).toSet == Set("a", "b", "c"))
    val cat = s"snapl${math.abs(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)
    // SQL: two legacy roots are two incompatible layout groups — the
    // error must name the upgrade path
    val e = intercept[IllegalStateException](spark.table(s"$cat.ev").collect())
    assert(e.getMessage.contains("migrateLegacyPartitioned"), e.getMessage)
    // the upgrade (ADVICE r4): copy files into the shared hive tree,
    // atomically rewrite manifests file-granular, drop legacy dirs —
    // after it the stage is ONE SQL-servable layout group
    assert(store.migrateLegacyPartitioned("ev") == 2)
    assert(spark.sql(s"SELECT v FROM $cat.ev")
      .collect().map(_.getString(0)).toSet == Set("a", "b", "c"))
    // both surfaces serve the same logical schema (hidden col dropped),
    // rows survive, and as-of isolation still selects per manifest
    assert(spark.table(s"$cat.ev").columns.toSeq ===
      store.read(spark, stage = Some("ev")).columns.toSeq)
    assert(store.read(spark, stage = Some("ev"))
      .collect().map(_.getString(1)).toSet == Set("a", "b", "c"))
    assert(store.read(spark, stage = Some("ev"), asOf = Some(1L)).count() == 2)
    // idempotent: nothing legacy left to migrate
    assert(store.migrateLegacyPartitioned("ev") == 0)
  }

  test("partitioned stage: as-of isolation, schema evolution, stats pruning over file manifests") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (store, _) = freshStore()
    store.commit(Seq(("a", "p1", 1L), ("b", "p2", 2L)).toDF("v", "pc", "k"),
      "s", "m1", partitionBy = Seq("pc"), statsCols = Seq("k"))
    store.commit(Seq(("c", "p1", 10L)).toDF("v", "pc", "k"),
      "s", "m2", partitionBy = Seq("pc"), statsCols = Seq("k"))

    // as-of reads select file lists per manifest — snapshot isolation
    // holds even though all files share one hive tree
    assert(store.read(spark, stage = Some("s")).count() == 3)
    assert(store.read(spark, stage = Some("s"), asOf = Some(1L)).count() == 2)
    // the partition column round-trips through the shared tree
    assert(store.read(spark, stage = Some("s"))
      .where(col("pc") === "p1").count() == 2)

    // manifest stats prune whole partitioned snapshots at planning time
    assert(store.readPruned(spark, "k", 5L, 20L, stage = Some("s"))
      .collect().map(_.getString(0)).toSeq == Seq("c"))
    assert(store.readPruned(spark, "k", 100L, 200L, stage = Some("s")).count() == 0)

    // additive schema evolution across partitioned snapshots: the
    // layout-group union serves the unified schema, old rows null
    store.commit(Seq(("d", "p2", 3L, "extra")).toDF("v", "pc", "k", "x"),
      "s", "m3", partitionBy = Seq("pc"))
    val ev = store.read(spark, stage = Some("s"), evolveSchema = true)
    assert(ev.columns.contains("x") && ev.count() == 4)
    assert(ev.where(col("x").isNotNull).collect().map(_.getString(0)).toSeq == Seq("d"))
  }

  test("SQL filter on a hidden-partition column prunes partition dirs via the catalog") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (store, dir) = freshStore()
    val events = Seq((86400L * 0 + 10, "a"), (86400L * 1 + 20, "b"),
      (86400L * 2 + 30, "c")).toDF("ts", "v")
    store.commit(events, "ev", "m1",
      hiddenPartitions = Seq("day" -> (col("ts").cast("long") / 86400L).cast("long")))

    val cat = s"snaph${math.abs(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)

    // the DEFAULT SQL table serves the LOGICAL schema — exactly what
    // SnapshotStore.read serves (one schema contract, VERDICT r4 #6)
    assert(spark.table(s"$cat.ev").columns.toSeq ===
      store.read(spark, stage = Some("ev")).columns.toSeq)
    assert(!spark.table(s"$cat.ev").columns.contains("day"))
    // the PHYSICAL layout view is the explicit $layout opt-in (the SQL
    // spelling of keepHidden=true): hidden col visible there, and a
    // WHERE on the transform column must become a PARTITION filter —
    // pruned dirs, not a row filter over all files
    val lv = "ev" + GraftCatalog.LayoutSuffix
    assert(spark.table(s"$cat.`$lv`").columns.contains("day"))
    val q = spark.sql(s"SELECT ts, v FROM $cat.`$lv` WHERE day = 1")
    assert(q.collect().map(_.getString(1)).toSeq == Seq("b"))
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    // the pruned scan plans exactly one FILE (one of the three day
    // dirs) — counting files, not RDD partitions, because Spark packs
    // multiple files into one partition and would pass vacuously
    val files = scan.batch.planInputPartitions().flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp.files
      case _ => Array.empty[org.apache.spark.sql.execution.datasources.PartitionedFile]
    }.length
    assert(files == 1,
      s"expected 1 surviving file after partition pruning, got $files; " +
        s"plan: ${scan.toString.take(900)}")

    // the layout view is read-only: INSERTing a computed layout column
    // would double-apply the transform
    val ins = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.`$lv` VALUES (5, 'x', 0)"))
    // must be THE read-only-view guard, not any incidental failure
    assert(ins.getMessage.contains("read-only physical view"),
      s"expected the layout-view write reject, got: ${ins.getMessage}")
  }

  test("a non-round-tripping hidden transform degrades the stage to programmatic-append-only") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    val (store, dir) = freshStore()
    // a UDF-backed transform: its analyzed .sql form ("UDF(ts)") is
    // not resolvable SQL. expr() parses LAZILY in Spark 4, so only an
    // eager parse+resolve at commit time catches this (r5 review) —
    // without it the broken SQL is recorded and the first INSERT dies
    // months later mid-commit instead of hitting the designed reject
    val dayUdf = udf((ts: Long) => ts / 86400L)
    store.commit(Seq((86410L, "a")).toDF("ts", "v"), "evu", "m1",
      hiddenPartitions = Seq("day" -> dayUdf(col("ts"))))
    val m = store.manifests().last
    assert(m.hidden == Seq("day") && m.hiddenExprs.isEmpty, m)
    // the layout itself committed fine and reads back logically
    assert(store.read(spark, stage = Some("evu")).columns.toSeq == Seq("ts", "v"))

    val cat = s"snapu${math.abs(dir.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.evu VALUES (5, 'x')"))
    assert(e.getMessage.contains("recorded without replayable transform SQL"),
      s"expected the programmatic-append-only reject, got: ${e.getMessage}")
  }

  test("a commit that changes the stage's layout spec is rejected, not written") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (store, _) = freshStore()
    // partitioned snapshots of one stage share ONE hive tree; Spark's
    // partition discovery rejects mixed column sets inside it
    // (CONFLICTING_PARTITION_COLUMN_NAMES), so a spec-changing commit
    // would poison every later read of the stage. It must fail AT THE
    // WRITE, loudly — previously a documented "should" left to caller
    // discipline, and the INSERT replay path could resurrect an
    // abandoned transform from the mixed state (r5 review)
    val rows = Seq((86410L, "a")).toDF("ts", "v")
    store.commit(rows, "evl", "m1",
      hiddenPartitions = Seq("day" -> (col("ts").cast("long") / 86400L).cast("long")))
    def rejects(label: String)(f: => Unit): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("poison the stage's shared hive tree"),
        s"$label: expected the layout-spec reject, got: ${e.getMessage}")
    }
    rejects("hidden transform renamed")(store.commit(rows, "evl", "m2",
      hiddenPartitions = Seq("hour" -> (col("ts").cast("long") / 3600L).cast("long"))))
    rejects("hidden dropped")(store.commit(rows, "evl", "m3"))
    rejects("hidden swapped for explicit")(
      store.commit(rows, "evl", "m4", partitionBy = Seq("v")))
    // nothing leaked into the log or the tree, and the stage still reads
    assert(store.manifests().count(_.stage == "evl") == 1)
    assert(store.read(spark, stage = Some("evl")).count() == 1)
    // the SAME spec keeps committing fine (respelled transform is OK —
    // the contract is the column-name spec)
    assert(store.commit(rows, "evl", "m5",
      hiddenPartitions = Seq("day" -> col("ts").cast("long").divide(86400L).cast("long"))).nonEmpty)
    assert(store.read(spark, stage = Some("evl")).count() == 2)
    // a spec change under a NEW stage name is the supported evolution
    assert(store.commit(rows, "evl_v2", "m6",
      hiddenPartitions = Seq("hour" -> (col("ts").cast("long") / 3600L).cast("long"))).nonEmpty)
  }
  test("compact folds live snapshots into one; history, markers, and replays survive") {
    import spark.implicits._
    val (store, _) = freshStore()
    // streaming-shaped: many tiny per-batch commits
    (0 until 5).foreach { b =>
      store.commit(Seq((b.toLong, s"v$b")).toDF("k", "v"), "tri", s"batch-$b")
    }
    val before = store.read(spark, stage = Some("tri"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(before.size == 5)

    val cid = store.compact(spark, "tri")
    assert(cid.contains(6L))
    // latest read: same content, ONE live snapshot planned
    val after = store.read(spark, stage = Some("tri"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before)
    assert(store.liveManifests().count(_.stage == "tri") == 1)
    // raw ledger keeps every manifest
    assert(store.manifests().count(_.stage == "tri") == 6)

    // id-scoped supersede: as-of BELOW the compaction sees history
    assert(store.read(spark, stage = Some("tri"), asOf = Some(2L)).count() == 2)
    // marker resume still serves the original snapshot
    assert(store.read(spark, stage = Some("tri"), marker = Some("batch-1")).count() == 1)
    // replaying an already-compacted batch id is STILL a no-op
    assert(store.commit(Seq((99L, "dup")).toDF("k", "v"), "tri", "batch-3").isEmpty)
    assert(store.read(spark, stage = Some("tri")).count() == 5)

    // a completed compaction retries as a no-op (one live snapshot left)
    assert(store.compact(spark, "tri").isEmpty)
  }

  test("compact preserves a partitioned+hidden layout and re-derives stats") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val (store, _) = freshStore()
    def rows(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"u$i", i * 3600L)).toDF("id", "name", "ts")
    store.commit(rows(1, 4), "evt", "m1", partitionBy = Seq("name"),
      hiddenPartitions = Seq("hour" -> (col("ts").cast("long") / 3600L).cast("long")),
      statsCols = Seq("id"))
    store.commit(rows(5, 8), "evt", "m2", partitionBy = Seq("name"),
      hiddenPartitions = Seq("hour" -> (col("ts").cast("long") / 3600L).cast("long")),
      statsCols = Seq("id"))

    val cid = store.compact(spark, "evt")
    assert(cid.nonEmpty)
    val cm = store.liveManifests().filter(_.stage == "evt")
    assert(cm.size == 1)
    // layout spec preserved; stats re-derived over the folded data
    assert(cm.head.parts == Seq("name") && cm.head.hidden == Seq("hour"))
    assert(cm.head.metrics.get("min_id").contains(1L))
    assert(cm.head.metrics.get("max_id").contains(8L))
    // logical schema unchanged (hidden column still projected away)
    val got = store.read(spark, stage = Some("evt"))
    assert(got.columns.toSet == Set("id", "name", "ts"))
    assert(got.count() == 8)
    // stats-pruned read keeps skipping at planning time
    assert(store.readPruned(spark, "id", 100, 200, stage = Some("evt")).count() == 0)
  }

  test("expireReplaced reclaims superseded data; the ledger and latest reads survive") {
    import spark.implicits._
    val (store, _) = freshStore()
    (0 until 3).foreach { b =>
      store.commit(Seq((b.toLong, s"v$b")).toDF("k", "v"), "tri", s"batch-$b")
    }
    store.compact(spark, "tri")
    assert(store.hasLiveData("tri", "batch-1"))

    assert(store.expireReplaced("tri") == 3)
    // latest read unchanged; the compacted snapshot holds the data
    assert(store.read(spark, stage = Some("tri")).count() == 3)
    // resume probe now reports dead -> resume paths recompute
    assert(!store.hasLiveData("tri", "batch-1"))
    // the marker ledger survives: replays stay no-ops after expiry
    assert(store.commit(Seq((99L, "dup")).toDF("k", "v"), "tri", "batch-2").isEmpty)
    // expiry is idempotent
    assert(store.expireReplaced("tri") == 0)
    // as-of below the compaction horizon now fails loudly, not silently-empty
    intercept[Exception] {
      store.read(spark, stage = Some("tri"), asOf = Some(2L)).collect()
    }
  }

  test("expireReplaced on a partitioned stage deletes exactly the superseded files") {
    import spark.implicits._
    val (store, root) = freshStore()
    store.commit(Seq((1L, "a")).toDF("k", "p"), "pt", "m1", partitionBy = Seq("p"))
    store.commit(Seq((2L, "b")).toDF("k", "p"), "pt", "m2", partitionBy = Seq("p"))
    val cid = store.compact(spark, "pt")
    assert(cid.nonEmpty)
    assert(store.expireReplaced("pt") == 2)
    // the shared hive tree still serves the compacted snapshot
    assert(store.read(spark, stage = Some("pt")).count() == 2)
    val cm = store.liveManifests().filter(_.stage == "pt").head
    assert(cm.files.nonEmpty && cm.files.forall(f => java.nio.file.Files.exists(java.nio.file.Paths.get(f))))
  }
  test("vacuumOrphans removes crash garbage, never live data — bucketed subdirs included") {
    import org.apache.spark.sql.functions.{col, pmod, xxhash64, lit}
    import spark.implicits._
    val (store, root) = freshStore()
    // live flat snapshot + live BUCKETED snapshot (manifests point at
    // snap-<id>/bucket=<b> SUBDIRS — the parent dir must survive) +
    // live partitioned snapshot (file-granular, shared part- tree)
    store.commit(Seq((1L, "a")).toDF("k", "v"), "flat", "m1")
    val bk = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
      .withColumn("bucket", pmod(xxhash64(col("k")), lit(2)).cast("int"))
    store.commitBuckets(bk, "bk", "bucket", Seq(0, 1), b => s"bk-$b")
    store.commit(Seq((5L, "p")).toDF("k", "p"), "pt", "m2", partitionBy = Seq("p"))

    // crash garbage: a data dir with no manifest, an in-flight temp
    // dir, and an unreferenced parquet inside the shared part- tree
    val data = java.nio.file.Paths.get(root, "data")
    val orphanDir = data.resolve("snap-99")
    java.nio.file.Files.createDirectories(orphanDir)
    java.nio.file.Files.write(orphanDir.resolve("junk.parquet"), Array[Byte](1, 2))
    val tmpDir = data.resolve(".tmp-snap-98")
    java.nio.file.Files.createDirectories(tmpDir)
    java.nio.file.Files.write(tmpDir.resolve("x.parquet"), Array[Byte](3))
    val treeOrphan = data.resolve("part-pt").resolve("p=zz")
    java.nio.file.Files.createDirectories(treeOrphan)
    java.nio.file.Files.write(treeOrphan.resolve("snap-77-orphan.parquet"), Array[Byte](4))

    val before = (store.read(spark, stage = Some("flat")).count(),
      store.read(spark, stage = Some("bk")).count(),
      store.read(spark, stage = Some("pt")).count())
    assert(store.vacuumOrphans() == 3)
    // every live read unchanged; garbage gone; vacuum is idempotent
    assert((store.read(spark, stage = Some("flat")).count(),
      store.read(spark, stage = Some("bk")).count(),
      store.read(spark, stage = Some("pt")).count()) == before)
    assert(!java.nio.file.Files.exists(orphanDir))
    assert(!java.nio.file.Files.exists(tmpDir))
    assert(!java.nio.file.Files.exists(treeOrphan.resolve("snap-77-orphan.parquet")))
    assert(store.vacuumOrphans() == 0)
  }
}
