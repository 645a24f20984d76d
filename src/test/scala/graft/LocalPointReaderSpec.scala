package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.core.{DocStore, Document, LocalPointReader}

import org.apache.spark.sql.functions._

/** The driver-local point reader must be indistinguishable from the Spark
  * LWW plan (`DocStore.get` / `latestWins`) on every store state the write
  * paths can produce: multi-batch overwrites, tombstones, resurrections,
  * DataFrame-batch seq ordering, compaction (clustered and not), nulls in
  * params values. The serving path (`getFast`/`getMany`) routes through it.
  */
class LocalPointReaderSpec extends SparkSpec {

  // every getMany in this suite must exercise the LOCAL path — a reader
  // defect may not hide behind the always-correct Spark fallback
  System.setProperty("graft.pointreader.strict", "true")

  private val dim = 4
  private def freshStore(): (DocStore, String) = {
    val dir = Files.createTempDirectory("lpr").toString
    (new DocStore(spark, dir), dir)
  }
  private def doc(id: String, x: Float, tag: String = "t") =
    Document(id, Array(x, x + 1, x + 2, x + 3), Map("tag" -> tag, "src" -> id))

  private def assertAgree(s: DocStore, name: String, ids: Seq[String]): Unit = {
    val fast = s.getMany(name, ids)
    // the projected existence probe must agree with the full read on
    // every id — same LWW, same tombstone handling
    val live = s.liveIds(name, ids)
    ids.foreach { id =>
      val slow = s.get(name, id)
      (slow, fast.get(id)) match {
        case (None, None) => ()
        case (Some(a), Some(b)) =>
          assert(a.id === b.id, s"id mismatch for $id")
          assert(a.vector.toSeq === b.vector.toSeq, s"vector mismatch for $id")
          assert(a.params === b.params, s"params mismatch for $id")
        case other => fail(s"presence mismatch for $id: $other")
      }
      assert(live.contains(id) === fast.contains(id), s"liveIds mismatch for $id")
    }
  }

  test("bloom-pruned probes agree across many runs (updates, deletes, absents)") {
    val (s, _) = freshStore(); s.init("m")
    // 40 single-doc batches → 40 immutable run files: the shape where
    // bloom pruning decides which runs are opened at all
    for (i <- 0 until 40) s.upsert("m", Seq(doc(s"id$i", i.toFloat)), dim)
    for (i <- 0 until 10) s.upsert("m", Seq(doc(s"id$i", 100f + i, "v2")), dim)
    s.delete("m", Seq("id5", "id20"), dim)
    val probe = (0 until 45).map(i => s"id$i") // 40-44 absent
    assertAgree(s, "m", probe)
    val expectLive = (0 until 40).map(i => s"id$i").filterNot(Set("id5", "id20")).toSet
    assert(s.liveIds("m", probe) === expectLive)
    // compaction swaps the run set under the memoized blooms — the new
    // files get fresh blooms, results unchanged
    s.compact("m", clusterById = true)
    assertAgree(s, "m", probe)
    assert(s.liveIds("m", probe) === expectLive)
  }

  test("collection-drop invalidation releases every bloom under the prefix") {
    val (s, root) = freshStore(); s.init("d")
    for (i <- 0 until 12) s.upsert("d", Seq(doc(s"id$i", i.toFloat)), dim)
    s.getMany("d", (0 until 12).map(i => s"id$i")) // builds the run blooms
    val (n, bytes) = LocalPointReader.bloomStats(s"$root/")
    assert(n > 0, "probe should have built per-run blooms")
    assert(bytes > 0L)
    LocalPointReader.invalidateUnder(s"$root/")
    assert(LocalPointReader.bloomStats(s"$root/") === ((0, 0L)),
      "invalidateUnder must release every bloom (and its budget bytes) under the prefix")
    // a fresh probe after invalidation rebuilds and still agrees
    assertAgree(s, "d", (0 until 12).map(i => s"id$i"))
  }

  test("local reads ≡ Spark LWW across overwrites, deletes, resurrection") {
    val (s, _) = freshStore(); s.init("c")
    s.upsert("c", Seq(doc("a", 1f, "v1"), doc("b", 2f), doc("c", 3f)), dim)
    s.upsert("c", Seq(doc("a", 9f, "v2"), doc("d", 4f)), dim) // overwrite a
    s.delete("c", Seq("b"), dim)                              // tombstone b
    s.delete("c", Seq("d"), dim)
    s.upsert("c", Seq(doc("d", 7f, "back")), dim)             // resurrect d
    assertAgree(s, "c", Seq("a", "b", "c", "d", "missing"))
    // winner content sanity, not just agreement
    val a = s.getFast("c", "a").get
    assert(a.vector(0) === 9f && a.params("tag") === "v2")
    assert(s.getFast("c", "b") === None)
    assert(s.getFast("c", "d").get.params("tag") === "back")
  }

  test("in-batch duplicate ids resolve to the LAST occurrence, both paths") {
    val (s, _) = freshStore(); s.init("c")
    s.upsert("c", Seq(doc("x", 1f, "first"), doc("x", 2f, "second"),
      doc("x", 3f, "third")), dim)
    assert(s.getFast("c", "x").get.params("tag") === "third")
    assertAgree(s, "c", Seq("x"))
  }

  test("DataFrame batches (streaming shape) agree, incl. null param values") {
    val (s, _) = freshStore(); s.init("c")
    val rows = (0 until 50).map(i =>
      (s"id$i", Array.fill(dim)(i.toFloat), Map("k" -> (if (i % 7 == 0) null else s"v$i"))))
    val df = spark.createDataFrame(rows).toDF("id", "vector", "params")
      .withColumn("vector", col("vector").cast("array<float>"))
    s.upsertDf("c", df)
    // second DF batch overwrites the odd ids
    val df2 = spark.createDataFrame(rows.filter(_._1.drop(2).toInt % 2 == 1)
      .map { case (id, v, _) => (id, v.map(_ + 100f), Map("k" -> "new")) })
      .toDF("id", "vector", "params")
      .withColumn("vector", col("vector").cast("array<float>"))
    s.upsertDf("c", df2)
    assertAgree(s, "c", (0 until 50).map(i => s"id$i") :+ "nope")
    assert(s.getFast("c", "id3").get.params("k") === "new")
    assert(s.getFast("c", "id0").get.params("k") === null)
  }

  test("compaction (plain and clustered) keeps both paths agreeing") {
    val (s, _) = freshStore(); s.init("c")
    (0 until 8).foreach { b =>
      s.upsert("c", (0 until 20).map(i => doc(s"k${(b * 7 + i) % 40}", b * 100 + i)), dim)
    }
    s.delete("c", Seq("k1", "k2"), dim)
    val ids = (0 until 40).map(i => s"k$i")
    assertAgree(s, "c", ids)
    s.compact("c")
    assertAgree(s, "c", ids)
    s.upsert("c", Seq(doc("k1", 5f, "post-compact")), dim)
    s.compact("c", clusterById = true, files = 4)
    assertAgree(s, "c", ids)
    assert(s.getFast("c", "k1").get.params("tag") === "post-compact")
  }

  test("empty/missing dirs read as absent without error") {
    val (s, _) = freshStore(); s.init("c")
    assert(s.getMany("c", Seq("a", "b")) === Map.empty)
    assert(LocalPointReader.readDocs("/nonexistent/dir", Set("a")) === Map.empty)
    assert(s.getMany("c", Nil) === Map.empty)
  }

  test("engine surface: getDocument and fetchDocuments run job-free reads") {
    val dir = Files.createTempDirectory("lpr-engine").toString
    val engine = new graft.api.Engine(spark, dir)
    engine.createCollection(graft.core.CollectionConfig("c", dim, graft.core.IndexType.Flat))
    engine.upsertDocument("c", doc("a", 1f))
    engine.upsertDocument("c", doc("b", 2f))
    engine.deleteDocument("c", "b")
    // job ids are assigned monotonically at submission, so bracketing the
    // reads between two named sentinel jobs makes the assertion exact: a job
    // launched by the reads would get an id strictly between the sentinels',
    // regardless of listener-event delivery timing (earlier write jobs can
    // still be in flight when the listener registers)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        seen.add((js.jobId, Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")))
    }
    def sentinel(group: String): Unit = {
      spark.sparkContext.setJobGroup(group, group)
      try spark.range(1).count() finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 30_000_000_000L
      while (!seen.asScala.exists(_._2 == group) && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(seen.asScala.exists(_._2 == group), s"sentinel $group never observed")
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      sentinel("lpr-sentinel-a")
      val got = engine.getDocument("c", "a")
      val many = engine.fetchDocuments("c", Seq("a", "b"))
      assert(got.get.vector(0) === 1f)
      assert(many.keySet === Set("a"))
      sentinel("lpr-sentinel-b")
      // one sentinel may run SEVERAL jobs (AQE) — the gap to assert empty is
      // (last job of A, first job of B); B's events arriving (global FIFO)
      // implies every earlier start event has been delivered
      val idA = seen.asScala.filter(_._2 == "lpr-sentinel-a").map(_._1).max
      val idB = seen.asScala.filter(_._2 == "lpr-sentinel-b").map(_._1).min
      val between = seen.asScala.map(_._1).filter(j => j > idA && j < idB)
      assert(between.isEmpty,
        s"point reads must not launch Spark jobs, saw ids $between")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
