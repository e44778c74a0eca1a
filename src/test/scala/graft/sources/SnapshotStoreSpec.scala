package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** Snapshot/lineage semantics (SURVEY.md §5.2): atomic append, as-of
  * reads, marker idempotence, crash-resume exactly-once:
  * commit(A) + crash + resume + commit(B) ≡ commit(A ∪ B). */
class SnapshotStoreSpec extends SparkSuite {

  private def freshStore(): (SnapshotStore, String) = {
    val dir = Files.createTempDirectory("snapstore").toString
    (new SnapshotStore(dir), dir)
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
    val ids = store.commitBuckets(df, "s", "bucket", Seq(0, 1, 2), b => s"s-b$b")
    assert(ids.size == 3)
    assert(store.markers() == Set("s-b0", "s-b1", "s-b2"))
    val ms = store.manifests()
    // observe-counted per-bucket rows; bucket 2 has no data at all
    assert(ms.map(m => m.metrics("bucket") -> m.rows).toMap ==
      Map(0L -> 2L, 1L -> 1L, 2L -> 0L))
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
}
