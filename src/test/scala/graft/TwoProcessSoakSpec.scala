package graft

import scala.collection.mutable

import graft.api.Engine
import graft.core._

/** TWO-JVM write soak — the cross-process proof of the writer protocol
  * (VERDICT r11 #1): a child JVM (`graft.tools.TwoProcessChild`, bare-JVM —
  * no Spark; driver-sized batches run wholly on the LocalRunWriter/ControlFs
  * path) and this process interleave upserts/deletes on ONE collection over
  * a SHARED id space, parent compacting mid-soak. The final store state must
  * equal the LWW model replayed from both processes' acknowledged batches,
  * and no version may ever be committed twice (duplicate versions are
  * exactly the (version, seq) tie hazard ADVICE r11 flagged).
  *
  * Row 2 disables the lease in BOTH processes: the counter's
  * create-exclusive collision + whole-batch retry must carry correctness
  * alone, with both processes still finishing (progress under contention) —
  * and the retry counters prove collisions actually fired.
  *
  * Row 3 is the cross-process STALENESS probe (VERDICT r11 #7): a serving
  * engine in this process must reflect a child JVM's commit on its next
  * search — the zero-job caches' stamp checks re-read the counter per
  * request, so a foreign process's write declines them exactly like an
  * own-process write.
  *
  * Runs on plain local roots (nio commit tokens) by default and on
  * graftfs:// (Hadoop manifest counters) under `-Dgraft.testfs=graftfs` —
  * both sides of the protocol get the two-JVM treatment.
  */
class TwoProcessSoakSpec extends SparkSpec {

  private val dim = 4

  /** The parent-side writer: same ack format as the child. `paceMs` > 0
    * paces batches — required when the lease is off (a saturating unleased
    * writer starves its peer off the retry budget BY DESIGN; the lease is
    * the liveness layer).
    */
  private def runWriter(store: DocStore, coll: String, batches: Int,
      seed: Int, paceMs: Long = 0L): Vector[String] = {
    val rnd = new scala.util.Random(seed)
    val acks = Vector.newBuilder[String]
    var b = 0
    while (b < batches) {
      b += 1
      if (paceMs > 0) Thread.sleep(rnd.nextLong(paceMs))
      val n = 1 + rnd.nextInt(6)
      val ids = Vector.fill(n)(s"doc-${rnd.nextInt(40)}")
      if (rnd.nextInt(6) == 0) {
        val v = store.deleteVersioned(coll, ids.distinct, dim)
        acks += s"D $v ${ids.distinct.mkString(",")}"
      } else {
        val docs = ids.zipWithIndex.map { case (id, j) =>
          val x = seed.toFloat * 1e6f + b * 100f + j
          Document(id, Array.tabulate(dim)(i => x + i), Map("b" -> s"$seed-$b"))
        }
        val v = store.upsert(coll, docs, dim)
        acks += s"U $v ${docs.map(d => s"${d.id}=${d.vector(0)}").mkString(",")}"
      }
    }
    acks.result()
  }

  private def spawnChild(root: String, coll: String, batches: Int, seed: Int,
      acksOut: String, leaseEnabled: Boolean, paceMs: Long = 0L): Process = {
    val java = s"${sys.props("java.home")}/bin/java"
    new ProcessBuilder(
      java, "-cp", sys.props("java.class.path"),
      s"-Dgraft.lease.enabled=$leaseEnabled",
      "graft.tools.TwoProcessChild",
      root, coll, dim.toString, batches.toString, seed.toString, acksOut,
      paceMs.toString)
      .redirectErrorStream(true).start()
  }

  /** Wait for the child's post-warmup READY marker, then signal GO — the
    * start barrier that makes the two contended loops overlap.
    */
  private def releaseChild(acksFile: String): Unit = {
    val ready = java.nio.file.Paths.get(acksFile + ".ready")
    val deadline = System.currentTimeMillis() + 120000
    while (!java.nio.file.Files.exists(ready)) {
      assert(System.currentTimeMillis() < deadline, "child never became ready")
      Thread.sleep(5)
    }
    java.nio.file.Files.createFile(java.nio.file.Paths.get(acksFile + ".go"))
  }

  private def drainAndWait(p: Process, timeoutSec: Long = 300): Unit = {
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS),
      s"child did not finish; output:\n$out")
    assert(p.exitValue() == 0, s"child failed (${p.exitValue()}):\n$out")
  }

  /** Replay acks into the LWW model: per id, the (version, position) max
    * wins; `None` value = tombstone winner. Returns (model, versions).
    */
  private def replay(acks: Seq[String])
      : (Map[String, Option[Float]], Seq[Long], Long) = {
    val best = mutable.HashMap.empty[String, (Long, Int, Option[Float])]
    val versions = Vector.newBuilder[Long]
    var retries = 0L
    acks.foreach { line =>
      val parts = line.split(" ")
      parts(0) match {
        case "R" => retries = parts(1).toLong
        case op =>
          val v = parts(1).toLong
          versions += v
          parts(2).split(",").zipWithIndex.foreach { case (tok, j) =>
            val (id, value) =
              if (op == "U") { val Array(i, x) = tok.split("="); (i, Some(x.toFloat)) }
              else (tok, None)
            if (best.get(id).forall { case (bv, bj, _) => v > bv || (v == bv && j > bj) })
              best(id) = (v, j, value)
          }
      }
    }
    (best.view.mapValues(_._3).toMap, versions.result(), retries)
  }

  private def assertFinalState(store: DocStore, coll: String,
      ackSets: Seq[Seq[String]]): Long = {
    val replays = ackSets.map(replay)
    val allVersions = replays.flatMap(_._2)
    assert(allVersions.distinct.size == allVersions.size,
      s"a version was committed twice: ${allVersions.groupBy(identity).collect { case (v, g) if g.size > 1 => v }}")
    // merge the per-process models: versions are globally unique, so the
    // global winner per id is the max-version entry across processes
    val merged = mutable.HashMap.empty[String, (Long, Option[Float])]
    ackSets.foreach { acks =>
      val best = mutable.HashMap.empty[String, (Long, Int, Option[Float])]
      acks.foreach { line =>
        val parts = line.split(" ")
        if (parts(0) != "R") {
          val v = parts(1).toLong
          parts(2).split(",").zipWithIndex.foreach { case (tok, j) =>
            val (id, value) =
              if (parts(0) == "U") { val Array(i, x) = tok.split("="); (i, Some(x.toFloat)) }
              else (tok, None)
            if (best.get(id).forall { case (bv, bj, _) => v > bv || (v == bv && j > bj) })
              best(id) = (v, j, value)
          }
        }
      }
      best.foreach { case (id, (v, _, value)) =>
        if (merged.get(id).forall(_._1 < v)) merged(id) = (v, value)
      }
    }
    val expected = merged.collect { case (id, (_, Some(x))) => id -> x }.toMap
    val got = store.read(coll).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[scala.collection.Seq[Float]]("vector").head)
      .toMap
    assert(got == expected,
      s"final state != LWW model; extra=${got.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- got.keySet} " +
        s"diff=${expected.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }}")
    // the driver-local point path must agree with the Spark path
    val sample = expected.keySet.take(10).toSeq ++ Seq("doc-0", "doc-39")
    val pts = store.getMany(coll, sample.distinct)
    sample.distinct.foreach { id =>
      assert(pts.get(id).map(_.vector(0)) == expected.get(id),
        s"point read disagrees with model for $id")
    }
    replays.map(_._3).sum
  }

  test("two JVMs, lease-serialized: interleaved upserts/deletes + parent compaction, final state ≡ LWW model, versions unique") {
    val root = testRoot("twojvm-lease")
    val store = new DocStore(spark, root)
    store.init("c")
    val acksFile = java.nio.file.Files.createTempFile("twojvm", ".acks").toString
    val child = spawnChild(root, "c", batches = 60, seed = 1, acksFile,
      leaseEnabled = true)
    releaseChild(acksFile)
    val parentAcks =
      try {
        val first = runWriter(store, "c", 30, seed = 2)
        store.compact("c") // mid-soak compaction, racing the child's writes
        val second = runWriter(store, "c", 30, seed = 3)
        first ++ second
      } finally drainAndWait(child)
    store.compact("c", clusterById = true)
    val childAcks = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(acksFile)).toArray.toSeq.map(_.toString)
    assert(childAcks.count(_.startsWith("U")) + childAcks.count(_.startsWith("D")) == 60,
      s"child must ack every batch: ${childAcks.size}")
    assertFinalState(store, "c", Seq(parentAcks, childAcks))
  }

  test("two JVMs, lease DISABLED: the collision backstop alone keeps versions unique and batches whole, with both processes progressing") {
    val root = testRoot("twojvm-collide")
    val store = new DocStore(spark, root)
    store.init("c")
    val acksFile = java.nio.file.Files.createTempFile("twojvm", ".acks").toString
    val prev = sys.props.put("graft.lease.enabled", "false")
    // parent-side JIT warmup too (this test must pass standalone, where
    // the LocalRunWriter stack is cold) — see the child's warmup comment
    store.init("warmp")
    (1 to 10).foreach(i => runWriter(store, "warmp", 2, seed = 100 + i))
    val parentAcks =
      try {
        val child = spawnChild(root, "c", batches = 120, seed = 1, acksFile,
          leaseEnabled = false, paceMs = 25)
        releaseChild(acksFile)
        try runWriter(store, "c", 120, seed = 2, paceMs = 25)
        finally drainAndWait(child)
      } finally prev match {
        case Some(v) => sys.props.put("graft.lease.enabled", v)
        case None => sys.props.remove("graft.lease.enabled")
      }
    val childAcks = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(acksFile)).toArray.toSeq.map(_.toString)
    val childRetries = assertFinalState(store, "c", Seq(parentAcks, childAcks))
    val totalRetries = childRetries + store.writeRetries.get
    info(s"collision retries: parent=${store.writeRetries.get} child=$childRetries")
    assert(totalRetries > 0,
      "240 unleased interleaved batches must have collided at least once — " +
        "if this ever flakes zero, raise the batch counts")
  }

  test("cross-process staleness: a serving engine reflects a child JVM's commit on the next search") {
    val root = testRoot("twojvm-stale")
    val engine = new Engine(spark, root)
    engine.createCollection(CollectionConfig("s", dim, IndexType.IvfFlat,
      SpaceType.L2, params = Map("nlist" -> "4")))
    (1 to 20).foreach(i => engine.upsertDocument("s",
      Document(s"base-$i", Array.tabulate(dim)(d => 1000f * i + d))))
    engine.buildIndex("s", nlist = 4)
    // warm the serving path (result cache + any zero-job cell caches)
    val q = Array.tabulate(dim)(d => 5f + d)
    val before = engine.searchDocuments("s", q, 3).map(_.id)
    assert(!before.contains("winner"))
    engine.searchDocuments("s", q, 3) // cached repeat
    // the OTHER process commits a doc exactly at the query point
    val acksFile = java.nio.file.Files.createTempFile("twojvm", ".acks").toString
    val java17 = s"${sys.props("java.home")}/bin/java"
    val p = new ProcessBuilder(java17, "-cp", sys.props("java.class.path"),
      "graft.tools.TwoProcessChild", root, "s", dim.toString, "0",
      q(0).toInt.toString, acksFile).redirectErrorStream(true).start()
    drainAndWait(p)
    // next search MUST see it: the result-cache key and every layout/serve
    // stamp re-read the (now advanced) counter — foreign commits decline
    // caches exactly like own-process writes
    val after = engine.searchDocuments("s", q, 3)
    assert(after.head.id == "winner",
      s"stale serve after a foreign commit: ${after.map(_.id)}")
  }
}
