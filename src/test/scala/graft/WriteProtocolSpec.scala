package graft

import java.nio.file.{Files, Paths}

import graft.core._

/** Deterministic unit coverage of the cross-process write protocol
  * (`DocStore.withNextVersion` + `RunNames` + `WriterLease`): collision
  * retry, loser-batch retraction (ADVICE r11 medium), reader refusal of
  * uncommitted runs, stolen-lease reconciliation, lease blocking/fencing.
  * The live two-JVM interleavings are TwoProcessSoakSpec's job.
  */
class WriteProtocolSpec extends SparkSpec {

  private def doc(id: String, x: Float, dim: Int = 4) =
    Document(id, Array.tabulate(dim)(i => x + i), Map("src" -> "t"))

  private def vecOf(s: DocStore, coll: String, id: String): Option[Float] =
    s.getMany(coll, Seq(id)).get(id).map(_.vector(0))

  test("counter collision: writer retracts its batch, re-stamps past the claimed value, commits clean") {
    val root = testRoot("proto-collide")
    val s = new DocStore(spark, root)
    s.init("c"); s.upsert("c", Seq(doc("a", 1f)), 4)
    val v = s.currentVersion("c")
    // simulate a racing process whose commit of v+1 just landed: pre-create
    // the create-exclusive token/manifest entry. On BOTH schemes the token/
    // entry IS the commit (counterRead = max(file, tokens) on nio, manifest
    // max on hadoop — a claim-without-commit window would let a delayed
    // counter-file write regress the committed view), so this writer simply
    // reads past it and lands its batch above; same-instant claim races are
    // TwoProcessSoakSpec's job
    val cfs = cfsOf(root)
    assert(cfs.createExclusive(f"$root/c/_version.d/v${v + 1}%020d", (v + 1).toString))
    s.upsert("c", Seq(doc("b", 2f)), 4)
    assert(s.currentVersion("c") > v + 1, "writer must land past the claimed value")
    assert(vecOf(s, "c", "b").contains(2f))
    assert(vecOf(s, "c", "a").contains(1f))
    // no retracted duplicate: exactly one run may carry the batch
    val runs = cfs.listNames(s"$root/c/data").filter(RunNames.isRun)
    val tagged = runs.flatMap(n => RunNames.version(n))
    assert(tagged.distinct.size == tagged.size,
      s"no two runs may share a version: $runs")
  }

  test("commit failure (non-collision) retracts the batch: no run with an uncommitted version stays behind") {
    assume(sys.props.get("graft.testfs").isEmpty, "uses faultfs directly")
    val dir = Files.createTempDirectory("proto-fault").toString
    val root = s"faultfs://$dir"
    val s = new DocStore(spark, root)
    s.init("c"); s.upsert("c", Seq(doc("a", 1f)), 4)
    val v = s.currentVersion("c")
    graft.testfs.FaultFs.failNext("create", "_version.d")
    val thrown = intercept[Exception] { s.upsert("c", Seq(doc("b", 2f)), 4) }
    assert(thrown.getMessage.contains("injected"))
    assert(s.currentVersion("c") == v, "counter must be unchanged")
    // ADVICE r11 medium: the loser's run must be GONE, not lurking at a
    // version a later writer will commit
    val runs = cfsOf(root).listNames(s"$root/c/data").filter(RunNames.isRun)
    assert(runs.flatMap(RunNames.version).forall(_ <= v),
      s"uncommitted run left behind: $runs")
    // and the next write reuses the version cleanly
    s.upsert("c", Seq(doc("b", 3f)), 4)
    assert(vecOf(s, "c", "b").contains(3f))
    graft.testfs.FaultFs.disarm()
  }

  test("readers refuse runs name-versioned above the committed counter (Spark scan AND point reader)") {
    val root = testRoot("proto-phantom")
    val s = new DocStore(spark, root)
    s.init("c"); s.upsert("c", Seq(doc("a", 1f)), 4)
    val v = s.currentVersion("c")
    // a crashed writer's debris: a fully-written run stamped v+5, counter
    // never advanced
    LocalRunWriter.writeStoreRun(s"$root/c/data",
      Seq(("ghost", Seq(9f, 9f, 9f, 9f), Map.empty[String, String], false)), v + 5)
    assert(s.read("c").count() == 1, "Spark reader must refuse the phantom run")
    assert(s.getMany("c", Seq("ghost", "a")).keySet == Set("a"),
      "point reader must refuse the phantom run")
    // an OVERWRITE phantom must not shadow the committed row either
    LocalRunWriter.writeStoreRun(s"$root/c/data",
      Seq(("a", Seq(7f, 7f, 7f, 7f), Map.empty[String, String], false)), v + 6)
    assert(vecOf(s, "c", "a").contains(1f))
    assert(s.read("c").filter("id = 'a'").head().getAs[Seq[Float]]("vector").head == 1f)
  }

  test("stolen lease reconciles crashed-writer debris before reusing versions") {
    val root = testRoot("proto-reconcile")
    val s = new DocStore(spark, root)
    s.init("c"); s.upsert("c", Seq(doc("a", 1f)), 4)
    val v = s.currentVersion("c")
    val cfs = cfsOf(root)
    // crash tableau: an orphan run at v+1, plus the dead writer's EXPIRED
    // lease (a crash mid-write always leaves the lease file behind)
    LocalRunWriter.writeStoreRun(s"$root/c/data",
      Seq(("ghost", Seq(9f, 9f, 9f, 9f), Map.empty[String, String], false)), v + 1)
    cfs.atomicWrite(s"$root/c/_writer.lease", s"dead-writer 12345")
    // next writer steals the lease, reconciles (deletes the orphan), and
    // commits v+1 itself — the ghost must never become visible
    s.upsert("c", Seq(doc("b", 2f)), 4)
    assert(s.currentVersion("c") == v + 1)
    assert(s.read("c").count() == 2)
    assert(s.getMany("c", Seq("ghost")).isEmpty)
    val runs = cfs.listNames(s"$root/c/data").filter(RunNames.isRun)
    assert(runs.flatMap(RunNames.version).count(_ == v + 1) == 1,
      s"exactly the new batch may carry v+1: $runs")
  }

  test("a held lease blocks a second writer until released; fence rejects a foreign takeover") {
    val root = testRoot("proto-lease")
    val cfs = cfsOf(root)
    cfs.mkdirs(root)
    val lease = s"$root/_writer.lease"
    val prevWait = sys.props.put("graft.lease.waitMs", "300")
    try {
      WriterLease.withLease(cfs, lease) { ctx =>
        assert(!ctx.stole)
        // a second acquirer cannot get in while we hold it
        val t0 = System.currentTimeMillis()
        intercept[WriterLease.LeaseTimeout] {
          WriterLease.withLease(cfs, lease)(_ => fail("must not acquire"))
        }
        assert(System.currentTimeMillis() - t0 >= 300)
        ctx.fence() // still ours
        // foreign takeover (what a TTL-steal looks like from the victim's
        // side): fence must throw, not let the commit proceed
        cfs.atomicWrite(lease, s"thief ${System.currentTimeMillis() + 60000}")
        intercept[WriterLease.LeaseLost] { ctx.fence() }
      }
      // release of a lost lease must not delete the thief's
      assert(cfs.readLinesSafe(lease).exists(_.head.startsWith("thief ")))
      cfs.deleteIfExists(lease)
      // and an EXPIRED lease is stolen, reported as such
      cfs.atomicWrite(lease, "dead 1")
      WriterLease.withLease(cfs, lease) { ctx => assert(ctx.stole) }
      assert(!cfs.exists(lease), "released after steal")
    } finally {
      prevWait match {
        case Some(w) => sys.props.put("graft.lease.waitMs", w)
        case None => sys.props.remove("graft.lease.waitMs")
      }
    }
  }

  test("staged Spark append publishes name-versioned parts, leaves no staging debris") {
    val root = testRoot("proto-staged")
    val s = new DocStore(spark, root)
    s.init("c")
    val n = LocalRunWriter.MaxLocalRows + 50 // force the Spark branch
    val docs = (0 until n).map(i => doc(s"d$i", i.toFloat))
    s.upsert("c", docs, 4)
    val v = s.currentVersion("c")
    val names = cfsOf(root).listNames(s"$root/c/data")
    val runs = names.filter(RunNames.isRun)
    assert(runs.nonEmpty && runs.forall(n => RunNames.version(n).contains(v)),
      s"every published part must carry the batch version: $runs")
    assert(!names.exists(_.startsWith(".staging-")), s"staging left behind: $names")
    assert(s.read("c").count() == n)
    assert(vecOf(s, "c", "d7").contains(7f))
  }

  test("committed counter reads are MONOTONE: a regressed counter file cannot roll back past a token") {
    // the review scenario: writer A stalls after claiming token v, writer B
    // retries to v+1 and commits, then A's delayed last-writer-wins file
    // write lands v — a file-only read would report v, filtering B's
    // acknowledged batch out of every scan and letting a lease-steal's
    // reconcileOrphans DELETE it
    val root = testRoot("proto-monotone")
    val s = new DocStore(spark, root)
    s.init("c"); s.upsert("c", Seq(doc("a", 1f)), 4)
    s.upsert("c", Seq(doc("b", 2f)), 4)
    val v = s.currentVersion("c")
    val cfs = cfsOf(root)
    // the delayed slower writer's file overwrite (nio atomicWrite is
    // last-writer-wins by design; hadoop has no counter file at all)
    if (ControlFs.isLocalRoot(root)) {
      AtomicFiles.atomicWrite(Paths.get(s"$root/c/_version"), (v - 1).toString)
      assert(cfs.counterRead(s"$root/c/_version").contains(v),
        "read must be max(file, tokens) — never the regressed file")
      assert(s.currentVersion("c") == v)
      assert(vecOf(s, "c", "b").contains(2f), "the v batch must stay visible")
    }
  }

  test("a stranded gen-pointer token self-heals: compaction is not wedged by a crash between token and file") {
    val root = testRoot("proto-genwedge")
    val s = new DocStore(spark, root)
    s.init("c")
    s.upsert("c", (0 until 10).map(i => doc(s"d$i", i.toFloat)), 4)
    val cfs = cfsOf(root)
    val gen = cfs.counterRead(s"$root/c/data_gen").getOrElse(0L)
    // a crashed compactor claimed gen+1 but died before the counter-file
    // write. Its generation DIR was fully written first (the compact
    // ordering), so the token must read as committed — without that, every
    // later compact() recomputes gen+1, collides on this token, and the
    // collection can never compact again
    s.compact("c") // writes gen+1's dir, commits its token
    if (ControlFs.isLocalRoot(root)) {
      // regress the FILE to simulate dying pre-write; the token stays
      AtomicFiles.atomicWrite(Paths.get(s"$root/c/data_gen"), gen.toString)
    }
    s.compact("c") // must target gen+2, not collide at gen+1
    assert(cfs.counterRead(s"$root/c/data_gen").exists(_ >= gen + 2))
    assert(s.read("c").count() == 10)
    assert(vecOf(s, "c", "d7").contains(7f))
  }
}
