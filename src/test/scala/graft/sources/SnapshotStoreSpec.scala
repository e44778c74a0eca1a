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
