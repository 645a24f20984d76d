package graft

import java.nio.file.Files

import graft.api.Engine
import graft.core._
import graft.testfs.ObjectStoreFs

/** The engine's commit protocols on OBJECT-STORE rename semantics: every
  * rename on `objstorefs://` is a COPY (destinations appear whole, like a
  * single-object PUT) then a DELETE of the source — NOT transactional,
  * with an injectable crash between the two. The `ControlFs`/`AtomicFiles`
  * scaladocs argue the marker/counter protocols tolerate exactly this;
  * this spec runs them on it instead of arguing.
  */
class ObjectStoreSemanticsSpec extends SparkSpec {

  private def objRoot(prefix: String): String =
    s"objstorefs://${Files.createTempDirectory(prefix)}"

  test("full engine lifecycle with copy+delete renames: CRUD, LWW, IVF build/serve, compaction, reload") {
    val root = objRoot("objstore-engine")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 3, IndexType.IvfFlat))
    (0 until 25).foreach(i =>
      e.upsertDocument("c", Document(f"d$i%03d", Array(i.toFloat, 0f, 0f))))
    e.upsertDocument("c", Document("d001", Array(100f, 0f, 0f))) // LWW
    e.deleteDocument("c", "d002")                                // tombstone
    e.buildIndex("c", nlist = 3)
    assert(e.searchDocuments("c", Array(5f, 0f, 0f), 3).map(_.id) ===
      Seq("d005", "d004", "d006"))
    assert(e.getDocument("c", "d001").get.vector(0) === 100f)
    assert(e.getDocument("c", "d002") === None)
    // store compaction: generation flip via the create-exclusive manifest
    // counter (no rename on the commit path at all)
    e.compact("c")
    assert(ControlFs.forRoot(root).counterRead(s"$root/c/data_gen") === Some(1L))
    assert(e.documents("c").count() === 24)
    // maintained point write (driver-direct run lands via copy+delete)
    e.upsertDocument("c", Document("d900", Array(5.5f, 0f, 0f)))
    assert(e.searchDocuments("c", Array(5f, 0f, 0f), 3).map(_.id) ===
      Seq("d005", "d900", "d004"))
    // fresh engine over the same root: snapshots + layout reload
    val e2 = new Engine(spark, root)
    assert(e2.searchDocuments("c", Array(5f, 0f, 0f), 3).map(_.id) ===
      Seq("d005", "d900", "d004"))
  }

  test("torn copy+delete on a marker commit: LOUD failure, marker whole (committed), retry clean") {
    val root = objRoot("objstore-torn")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 2, IndexType.IvfFlat))
    (0 until 12).foreach(i =>
      e.upsertDocument("c", Document(f"d$i%02d", Array(i.toFloat, 0f))))
    // the layout_version commit's rename crashes BETWEEN copy and delete:
    // the marker IS committed (destination whole) but the writer sees an
    // exception — at worst a committed write with a loud error, never a
    // torn marker
    ObjectStoreFs.crashBetweenCopyAndDelete("layout_version")
    try {
      intercept[Exception](e.buildIndex("c", nlist = 3))
      val cfs = ControlFs.forRoot(root)
      val stamp = cfs.readLongSafe(s"$root/c/index/layout_version")
      // whichever side of the crash: absent (stale → fallback) or the full
      // committed store version (12 upserts) — NEVER truncated (a torn
      // value would parse-fail and read as absent)
      assert(stamp.isEmpty || stamp.contains(12L),
        s"marker must be absent or whole, got $stamp")
      // searches stay exactly correct either way
      assert(e.searchDocuments("c", Array(5f, 0f), 3).map(_.id) ===
        Seq("d05", "d04", "d06"))
      // a clean retry converges: marker committed, layout serves
      e.buildIndex("c", nlist = 3)
      assert(cfs.readLongSafe(s"$root/c/index/layout_version").isDefined)
      assert(e.searchDocuments("c", Array(5f, 0f), 3).map(_.id) ===
        Seq("d05", "d04", "d06"))
    } finally ObjectStoreFs.disarm()
  }

  // DATA-PLANE COMMITTER rows (VERDICT r11 #5): Spark JOB writes (compaction
  // rewrites, buildIndex layout materialization) go through the default
  // rename-based FileOutputCommitter; on this scheme its commit renames are
  // file-by-file copies with an injectable crash — destination files land
  // ONE BY ONE and the job can die with a partial destination. The
  // generation-pointer protocols must make that window invisible: the
  // pointer flips only after the job fully commits, so a crashed job leaves
  // an orphaned next-generation dir that the retry's mode("overwrite")
  // simply rewrites.
  //
  // Real-s3a committer guidance (this sandbox proves the protocol, not the
  // throughput): the default FileOutputCommitter v1 is slow-but-safe on
  // object stores (every commit rename is a COPY); prefer the S3A
  // committers ("magic" or "directory"/staging — fs.s3a.committer.name)
  // which PUT task output directly and commit via multipart-upload
  // completion, eliminating the copies. The engine's correctness does not
  // depend on the choice: all visibility decisions ride the ControlFs
  // generation/version pointers, never on _SUCCESS or rename atomicity.

  test("committer crash mid job-commit: compaction fails LOUDLY before the pointer flip, partial next-gen dir is invisible, retry converges") {
    val root = objRoot("objstore-compact")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 2, IndexType.IvfFlat))
    (0 until 30).foreach(i =>
      e.upsertDocument("c", Document(f"d$i%02d", Array(i.toFloat, 0f))))
    e.deleteDocument("c", "d07")
    e.compact("c") // clean baseline: generation 1
    val cfs = ControlFs.forRoot(root)
    assert(cfs.counterRead(s"$root/c/data_gen") === Some(1L))
    // v1 committer job-commit renames task_* dirs into the destination —
    // crash between copy and delete of one: destination PARTIAL, job dies
    ObjectStoreFs.crashBetweenCopyAndDelete("task_")
    try {
      intercept[Exception](e.compact("c"))
      // the flip never happened: readers keep the intact generation 1
      assert(cfs.counterRead(s"$root/c/data_gen") === Some(1L),
        "a failed compaction must never flip the generation pointer")
      assert(e.documents("c").count() === 29)
      assert(e.getDocument("c", "d07") === None)
      // retry: mode("overwrite") rewrites the orphaned partial dir whole
      e.compact("c")
      assert(cfs.counterRead(s"$root/c/data_gen") === Some(2L))
      assert(e.documents("c").count() === 29)
    } finally ObjectStoreFs.disarm()
  }

  test("committer crash mid layout job-commit: buildIndex fails LOUDLY before the layout-gen flip, searches keep serving, retry converges") {
    val root = objRoot("objstore-build")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 2, IndexType.IvfFlat))
    (0 until 20).foreach(i =>
      e.upsertDocument("c", Document(f"d$i%02d", Array(i.toFloat, 0f))))
    e.buildIndex("c", nlist = 3) // baseline layout, generation flip to 1
    val cfs = ControlFs.forRoot(root)
    val gen0 = cfs.counterRead(s"$root/c/index/layout_gen").getOrElse(0L)
    assert(e.searchDocuments("c", Array(5f, 0f), 3).map(_.id) ===
      Seq("d05", "d04", "d06"))
    ObjectStoreFs.crashBetweenCopyAndDelete("task_")
    try {
      intercept[Exception](e.buildIndex("c", nlist = 3))
      // un-flipped: the previous generation keeps serving, results exact
      assert(cfs.counterRead(s"$root/c/index/layout_gen") === Some(gen0),
        "a failed build must never flip the layout generation")
      assert(e.searchDocuments("c", Array(5f, 0f), 3).map(_.id) ===
        Seq("d05", "d04", "d06"))
      e.buildIndex("c", nlist = 3)
      assert(cfs.counterRead(s"$root/c/index/layout_gen") === Some(gen0 + 1))
      assert(e.searchDocuments("c", Array(5f, 0f), 3).map(_.id) ===
        Seq("d05", "d04", "d06"))
    } finally ObjectStoreFs.disarm()
  }

  test("torn copy+delete on a driver-direct run commit: write is visible-whole or loudly failed, never half") {
    val root = objRoot("objstore-run")
    val store = new DocStore(spark, root)
    store.init("c")
    store.upsert("c", Seq(Document("a", Array(1f, 0f))), 2)
    // the NEXT run file's rename crashes between copy and delete: the run
    // is already visible whole, the version counter has NOT yet committed
    // — the writer sees the exception before acking
    ObjectStoreFs.crashBetweenCopyAndDelete("part-local-")
    try {
      val r = scala.util.Try(
        store.upsert("c", Seq(Document("b", Array(2f, 0f))), 2))
      if (r.isFailure) {
        // loud path: counter still at 1; a retry commits cleanly
        assert(store.currentVersion("c") === 1L)
        store.upsert("c", Seq(Document("b", Array(2f, 0f))), 2)
      }
      assert(store.get("c", "b").map(_.vector(0)) === Some(2f))
      assert(store.read("c").count() === 2)
    } finally ObjectStoreFs.disarm()
  }
}
