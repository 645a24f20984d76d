package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.Engine
import graft.core.{CollectionConfig, Document, IndexType}

/** Tombstone-aware layout maintenance: update and delete batches keep every
  * indexed tier SERVING (layout stamp current, no stale fallback to an
  * exact scan), with results equal to a from-scratch rebuild over the final
  * corpus state — the capability the reference keeps through hnswlib's
  * markDeleted (`/root/reference/internal/index/hnsw.go:84-90`,
  * `internal/engine/index/hnswlib/hnswalg.h:925-943`), re-expressed as an
  * LSM shape: layout rows = sorted runs, `_tombstones` sidecar = delete
  * markers, buildIndex/compactLayout = the fold.
  */
class TombstoneSpec extends SparkSpec {
  import spark.implicits._

  private def stampOf(root: String, coll: String): Long =
    graft.core.ControlFs.forRoot(root)
      .readString(s"$root/$coll/index/layout_version").trim.toLong

  private def mkCorpus(n: Int): Seq[Document] =
    (0 until n).map(i => Document(i.toString, Array(i * 1f, (i % 7) * 1f, 0f, 0f)))

  // every tier with a materialized layout; hnsw both plain and routed
  private val tiers: Seq[(String, IndexType, Map[String, String])] = Seq(
    ("ivf", IndexType.IvfFlat, Map.empty),
    ("pq", IndexType.IvfPq, Map("m" -> "2")),
    ("opq", IndexType.Opq, Map("m" -> "2")),
    ("sq", IndexType.Sq, Map.empty),
    ("bq", IndexType.Bq, Map.empty),
    ("mrl", IndexType.Mrl, Map("prefixDim" -> "2")),
    ("g", IndexType.Hnsw, Map.empty),
    ("gr", IndexType.Hnsw, Map("routeNlist" -> "4")))

  test("update + delete batches keep every indexed tier current; results ≡ rebuild") {
    for ((coll, it, params) <- tiers) {
      val root = testRoot(s"tomb-$coll")
      val e = new Engine(spark, root)
      e.createCollection(CollectionConfig(coll, 4, it, params = params))
      e.batchUpsertDocuments(coll, mkCorpus(30))
      e.buildIndex(coll, nlist = 2)
      if (params.contains("routeNlist")) e.setParams(coll, Map("routeNprobe" -> 4))
      // bq's sign-bit shortlist is model-dependent (per-dim means differ
      // between the two training corpora) — widen the exact re-rank to the
      // whole corpus so both engines rank exactly and equality is meaningful
      if (it == IndexType.Bq) e.setParams(coll, Map("rerankFactor" -> 40))
      val s0 = stampOf(root, coll)
      // UPDATE batch: move ids 3 and 7 far away
      e.ingestBatchIndexed(coll,
        Seq(("3", Seq(50f, 50f, 0f, 0f), Map.empty[String, String]),
            ("7", Seq(60f, 60f, 0f, 0f), Map.empty[String, String]))
          .toDF("id", "vector", "params"), batchId = Some(0L))
      assert(stampOf(root, coll) === s0 + 1,
        s"$coll: update batch staled the layout (no tombstone maintenance)")
      // DELETE batch: ids 5 and 9 (and an absent id — harmless)
      e.deleteDocuments(coll, Seq("5", "9", "999"))
      assert(stampOf(root, coll) === s0 + 2,
        s"$coll: delete batch staled the layout (no tombstone maintenance)")

      // a twin engine whose index is BUILT FRESH over the same final state
      val root2 = testRoot(s"tomb-$coll-twin")
      val e2 = new Engine(spark, root2)
      e2.createCollection(CollectionConfig(coll, 4, it, params = params))
      e2.batchUpsertDocuments(coll, mkCorpus(30).filterNot(d => Set("5", "9")(d.id))
        .map(d => if (d.id == "3") Document("3", Array(50f, 50f, 0f, 0f))
          else if (d.id == "7") Document("7", Array(60f, 60f, 0f, 0f)) else d))
      e2.buildIndex(coll, nlist = 2)
      if (params.contains("routeNlist")) e2.setParams(coll, Map("routeNprobe" -> 4))
      if (it == IndexType.Bq) e2.setParams(coll, Map("rerankFactor" -> 40))

      // probes: the moved ids' new locations, their old locations, and a
      // query whose would-be answer is a deleted id
      val probes = Seq(
        Array(50f, 50f, 0f, 0f), // id 3's new home
        Array(3.2f, 3f, 0f, 0f), // id 3's old neighborhood
        Array(5f, 5f, 0f, 0f),   // deleted id 5's exact old vector
        Array(9.1f, 2f, 0f, 0f), // deleted id 9's old neighborhood
        Array(60f, 60f, 0f, 0f)) // id 7's new home
      for (q <- probes; k <- Seq(1, 5)) {
        val got = e.searchDocuments(coll, q, k).map(h => (h.id, h.distance))
        val want = e2.searchDocuments(coll, q, k).map(h => (h.id, h.distance))
        assert(got === want,
          s"$coll: maintained layout diverged from rebuild at q=${q.toSeq} k=$k: $got vs $want")
        assert(!got.exists(h => Set("5", "9")(h._1)),
          s"$coll: deleted id served at q=${q.toSeq}")
      }
      // chained mutation: delete one of the UPDATED ids — the newest delta/
      // layout incarnation must die too (tombstone ver strictly later)
      e.deleteDocuments(coll, Seq("3"))
      assert(stampOf(root, coll) === s0 + 3,
        s"$coll: chained delete staled the layout")
      val after = e.searchDocuments(coll, Array(50f, 50f, 0f, 0f), 2).map(_.id)
      assert(!after.contains("3"), s"$coll: deleted updated id still served: $after")
    }
  }

  test("REST batch upserts keep every indexed tier current; results ≡ rebuild") {
    for ((coll, it, params) <- tiers) {
      val root = testRoot(s"rest-$coll")
      val e = new Engine(spark, root)
      e.createCollection(CollectionConfig(coll, 4, it, params = params))
      e.batchUpsertDocuments(coll, mkCorpus(30)) // unbuilt → plain path
      e.buildIndex(coll, nlist = 2)
      if (params.contains("routeNlist")) e.setParams(coll, Map("routeNprobe" -> 4))
      if (it == IndexType.Bq) e.setParams(coll, Map("rerankFactor" -> 40))
      val s0 = stampOf(root, coll)
      // one REST batch mixing an UPDATE of an indexed id, an in-batch
      // duplicate (the LAST occurrence must win — sequential-put), and
      // fresh inserts
      e.batchUpsertDocuments(coll, Seq(
        Document("3", Array(50f, 50f, 0f, 0f)),
        Document("40", Array(1f, 2f, 3f, 4f)), // shadowed by the next row
        Document("40", Array(70f, 70f, 0f, 0f)),
        Document("41", Array(80f, 80f, 0f, 0f))))
      assert(stampOf(root, coll) === s0 + 1,
        s"$coll: REST batch upsert staled the layout")
      // all-or-nothing: a wrong-dimension doc in a maintained batch throws
      // BEFORE any write — neither the store nor the layout may move
      val ex = intercept[IllegalArgumentException] {
        e.batchUpsertDocuments(coll,
          Seq(Document("90", Array(1f, 1f, 0f, 0f)), Document("91", Array(1f, 1f))))
      }
      assert(ex.getMessage.contains("dimension"))
      assert(stampOf(root, coll) === s0 + 1, s"$coll: failed batch moved the stamp")
      e.deleteDocuments(coll, Seq("5"))
      assert(stampOf(root, coll) === s0 + 2,
        s"$coll: delete after REST upsert staled the layout")

      // twin engine BUILT FRESH over the same final corpus state
      val root2 = testRoot(s"rest-$coll-twin")
      val e2 = new Engine(spark, root2)
      e2.createCollection(CollectionConfig(coll, 4, it, params = params))
      e2.batchUpsertDocuments(coll,
        mkCorpus(30).filterNot(_.id == "5")
          .map(d => if (d.id == "3") Document("3", Array(50f, 50f, 0f, 0f)) else d)
          ++ Seq(Document("40", Array(70f, 70f, 0f, 0f)),
            Document("41", Array(80f, 80f, 0f, 0f))))
      e2.buildIndex(coll, nlist = 2)
      if (params.contains("routeNlist")) e2.setParams(coll, Map("routeNprobe" -> 4))
      if (it == IndexType.Bq) e2.setParams(coll, Map("rerankFactor" -> 40))

      val probes = Seq(
        Array(50f, 50f, 0f, 0f), // updated id 3's new home
        Array(3.2f, 3f, 0f, 0f), // id 3's old neighborhood
        Array(70f, 70f, 0f, 0f), // duplicate-resolved insert
        Array(80f, 80f, 0f, 0f), // plain insert
        Array(5f, 5f, 0f, 0f))   // deleted id 5's exact old vector
      for (q <- probes; k <- Seq(1, 5)) {
        val got = e.searchDocuments(coll, q, k).map(h => (h.id, h.distance))
        val want = e2.searchDocuments(coll, q, k).map(h => (h.id, h.distance))
        assert(got === want,
          s"$coll: REST-maintained layout diverged from rebuild at q=${q.toSeq} k=$k: $got vs $want")
        assert(!got.exists(_._1 == "5"), s"$coll: deleted id served at q=${q.toSeq}")
      }
      // the duplicate's FIRST occurrence must be dead everywhere
      val dup = e.searchDocuments(coll, Array(1f, 2f, 3f, 4f), 30)
        .filter(_.id == "40").map(_.distance)
      val dupTwin = e2.searchDocuments(coll, Array(1f, 2f, 3f, 4f), 30)
        .filter(_.id == "40").map(_.distance)
      assert(dup === dupTwin, s"$coll: in-batch duplicate resolution diverged")

      // REBIRTH of the deleted id: the overlap probe sees it as absent
      // (getMany omits tombstoned ids) so NO new shadow is written — the
      // delete's own earlier sidecar entry must already cover the old
      // incarnation, and the reborn row (version > delete version) must
      // serve. This pins the docstring's "absent-or-deleted ids are
      // already covered" argument.
      e.batchUpsertDocuments(coll, Seq(Document("5", Array(90f, 90f, 0f, 0f))))
      assert(stampOf(root, coll) === s0 + 3, s"$coll: rebirth staled the layout")
      val reborn = e.searchDocuments(coll, Array(90f, 90f, 0f, 0f), 1)
      assert(reborn.map(_.id) === Seq("5") && reborn.head.distance === 0.0,
        s"$coll: reborn id not served at its new vector: $reborn")
      assert(!e.searchDocuments(coll, Array(5f, 5f, 0f, 0f), 3).exists(h =>
        h.id == "5" && h.distance == 0.0),
        s"$coll: reborn id still serves its pre-delete incarnation")
      // UPDATE of the REST-inserted id (delta-resident on the graph tiers):
      // the old incarnation at (70,70) must die, the move must serve
      e.batchUpsertDocuments(coll, Seq(Document("40", Array(75f, 75f, 0f, 0f))))
      assert(stampOf(root, coll) === s0 + 4, s"$coll: delta-row update staled the layout")
      assert(e.searchDocuments(coll, Array(75f, 75f, 0f, 0f), 1).map(_.id) === Seq("40"),
        s"$coll: updated delta-resident id not served at its new vector")
      assert(!e.searchDocuments(coll, Array(70f, 70f, 0f, 0f), 3).exists(h =>
        h.id == "40" && h.distance == 0.0),
        s"$coll: updated delta-resident id still serves its old incarnation")
    }
  }

  test("maintained REST point writes on the quantized tiers run job-free") {
    // steady state (models memoized by buildIndex, blooms warm): an insert
    // and an update batch on every quantized/clustered tier must launch
    // ZERO Spark jobs — the LocalEncode + LocalRunWriter path, the same
    // contract the hnsw tier's delta branch already meets. Sentinel jobs
    // bracket the writes (job ids are monotonic at submission), exactly the
    // LocalPointReaderSpec pattern.
    val quantized = tiers.filterNot(_._2 == IndexType.Hnsw)
    val engines = quantized.map { case (coll, it, params) =>
      val root = testRoot(s"jobfree-$coll")
      val e = new Engine(spark, root)
      e.createCollection(CollectionConfig(coll, 4, it, params = params))
      e.batchUpsertDocuments(coll, mkCorpus(30))
      e.buildIndex(coll, nlist = 2)
      // one warm write outside the bracket: first-call lazy init (encoders,
      // bloom build on the fresh run) must not count against steady state
      e.batchUpsertDocuments(coll, Seq(Document("warm", Array(9f, 9f, 0f, 0f))))
      (coll, e)
    }
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        seen.add((js.jobId, Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")))
    }
    import scala.jdk.CollectionConverters._
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
      sentinel("tomb-jobfree-a")
      for ((coll, e) <- engines) {
        e.batchUpsertDocuments(coll, Seq(Document("50", Array(7f, 8f, 0f, 0f))))
        e.batchUpsertDocuments(coll, Seq(Document("3", Array(55f, 55f, 0f, 0f))))
      }
      sentinel("tomb-jobfree-b")
      val idA = seen.asScala.filter(_._2 == "tomb-jobfree-a").map(_._1).max
      val idB = seen.asScala.filter(_._2 == "tomb-jobfree-b").map(_._1).min
      val between = seen.asScala.map(_._1).filter(j => j > idA && j < idB)
      assert(between.isEmpty,
        s"quantized maintained point writes must not launch Spark jobs, saw ids $between")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the writes must have been MAINTAINED (stamp advanced), not stale
    for ((coll, e) <- engines) {
      val hit = e.searchDocuments(coll, Array(55f, 55f, 0f, 0f), 1)
      assert(hit.map(_.id) === Seq("3"), s"$coll: job-free update not served: $hit")
    }
  }

  test("compactLayout folds tombstones: shadowed rows gone, sidecar cleared, results stable") {
    val root = testRoot("tomb-fold")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 4, IndexType.Sq))
    e.batchUpsertDocuments("c", mkCorpus(30))
    e.buildIndex("c")
    e.ingestBatchIndexed("c",
      Seq(("3", Seq(50f, 50f, 0f, 0f), Map.empty[String, String]))
        .toDF("id", "vector", "params"), batchId = Some(0L))
    e.deleteDocuments("c", Seq("5"))
    val layout = e.layoutDir("c").get // generation-resolved
    assert(cfsOf(layout).exists(s"$layout/_tombstones"),
      "setup: sidecar expected")
    val before = e.searchDocuments("c", Array(4.9f, 4f, 0f, 0f), 5).map(_.id)
    assert(e.compactLayout("c"), "compaction must run on the current layout")
    // the fold wrote a NEW generation: the sidecar retired with the old dir
    val folded = e.layoutDir("c").get
    assert(folded != layout, "compaction must flip to a new generation")
    assert(!cfsOf(folded).exists(s"$folded/_tombstones"),
      "compaction must fold the tombstone sidecar away")
    // folded layout holds exactly the live incarnations: no row for the
    // deleted id, exactly one (the new one) for the updated id
    val ids = spark.read.parquet(folded).groupBy("id").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!ids.contains("5"), "deleted id survived the fold")
    assert(ids("3") === 1L, s"updated id kept ${ids("3")} incarnations after fold")
    assert(e.searchDocuments("c", Array(4.9f, 4f, 0f, 0f), 5).map(_.id) === before,
      "fold changed served results")
  }

  test("a sidecar dir holding only an in-flight append's staging reads as empty, not a scan error") {
    // the concurrency soak caught compactLayout throwing UNABLE_TO_INFER_SCHEMA:
    // the FIRST Spark mode("append") to a fresh `_tombstones` sidecar creates
    // the dir with only `_temporary` staging inside, and an exists()-then-infer
    // reader racing that window sees a parquet dir with zero committed files.
    // Deterministic replay of that window: materialize exactly the staging
    // shape and drive every sidecar consumer through it.
    val root = testRoot("tomb-staging")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 4, IndexType.Sq))
    e.batchUpsertDocuments("c", mkCorpus(30))
    e.buildIndex("c")
    val clean = e.searchDocuments("c", Array(4.9f, 4f, 0f, 0f), 5).map(_.id)
    val layout = e.layoutDir("c").get
    cfsOf(layout).mkdirs(s"$layout/_tombstones/_temporary/0")
    // uncommitted delete not visible yet (snapshot semantics): same results
    assert(e.searchDocuments("c", Array(4.9f, 4f, 0f, 0f), 5).map(_.id) === clean,
      "staging-only sidecar changed served results")
    assert(e.compactLayout("c"), "compactLayout must survive a staging-only sidecar")
    // committed tombstones after the window still apply (stamp re-reads)
    e.deleteDocuments("c", Seq(clean.head))
    assert(!e.searchDocuments("c", Array(4.9f, 4f, 0f, 0f), 5).map(_.id)
        .contains(clean.head), "committed delete must shadow after the window")

    // same window on the graph tier's `_delta` sidecar (cachedDelta readers)
    e.createCollection(CollectionConfig("g", 4, IndexType.Hnsw))
    e.batchUpsertDocuments("g", mkCorpus(30))
    e.buildIndex("g")
    val gClean = e.searchDocuments("g", Array(4.9f, 4f, 0f, 0f), 5).map(_.id)
    cfsOf(root).mkdirs(s"${e.layoutDir("g").get}/_delta/_temporary/0")
    assert(e.searchDocuments("g", Array(4.9f, 4f, 0f, 0f), 5).map(_.id) === gClean,
      "staging-only delta changed served results")
  }

  test("tombstoneCompactRows auto-folds; graph tier folds via rebuild and serves post-fold") {
    val root = testRoot("tomb-auto")
    val e = new Engine(spark, root)
    // quantized tier: auto-compact at 2 tombstone rows
    e.createCollection(CollectionConfig("c", 4, IndexType.Sq,
      params = Map("tombstoneCompactRows" -> "2")))
    e.batchUpsertDocuments("c", mkCorpus(20))
    e.buildIndex("c")
    e.deleteDocuments("c", Seq("5", "9"))
    assert(!cfsOf(root).exists(s"${e.layoutDir("c").get}/_tombstones"),
      "tombstoneCompactRows must have folded the sidecar")
    assert(!e.searchDocuments("c", Array(5f, 5f, 0f, 0f), 3).map(_.id).contains("5"))
    // graph tier: the fold is a buildIndex (adjacency rewrite); the layout
    // must serve through it and the sidecar must be gone
    e.createCollection(CollectionConfig("g", 4, IndexType.Hnsw,
      params = Map("tombstoneCompactRows" -> "2")))
    e.batchUpsertDocuments("g", mkCorpus(20))
    e.buildIndex("g")
    e.deleteDocuments("g", Seq("5", "9"))
    assert(!cfsOf(root).exists(s"${e.layoutDir("g").get}/_tombstones"),
      "graph tombstone fold (rebuild) did not clear the sidecar")
    val hits = e.searchDocuments("g", Array(5f, 5f, 0f, 0f), 3).map(_.id)
    assert(!hits.contains("5") && !hits.contains("9"),
      s"deleted ids served after the graph fold: $hits")
  }

  test("multivector collection: maintained searchMaxSim ≡ from-scratch rebuild " +
      "after update, shrink-update and delete") {
    // the multivector surface rides batchUpsertDocuments/deleteDocuments, so
    // the tombstone machinery applies per TOKEN row — this gates the
    // composition end-to-end the way the 8 single-vector tiers are gated:
    // maintained serving equals a twin engine rebuilt over the final state.
    def tok(a: Float, b: Float) = Array(a, b, 0f, 0f)
    val docs0 = (0 until 12).map(i =>
      (s"d$i", Seq(tok(i, 0f), tok(i, 1f), tok(i, 2f))))
    val finalDocs = docs0
      .filterNot(_._1 == "d5") // deleted
      .map { case ("d3", _) => ("d3", Seq(tok(50f, 50f), tok(51f, 51f))) // shrunk 3→2 + moved
             case d => d }

    val root = testRoot("tomb-mv")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("mv", 4, IndexType.IvfFlat,
      params = Map("multivector" -> "true")))
    e.batchUpsertMultiVector("mv", docs0)
    e.buildIndex("mv", nlist = 2)
    e.batchUpsertMultiVector("mv", Seq(finalDocs.find(_._1 == "d3").get))
    e.deleteMultiVector("mv", "d5")

    val root2 = testRoot("tomb-mv-twin")
    val e2 = new Engine(spark, root2)
    e2.createCollection(CollectionConfig("mv", 4, IndexType.IvfFlat,
      params = Map("multivector" -> "true")))
    e2.batchUpsertMultiVector("mv", finalDocs)
    e2.buildIndex("mv", nlist = 2)

    val queries = Seq(
      ("q0", Seq(tok(50f, 50f), tok(51f, 51f))), // d3's new tokens
      ("q1", Seq(tok(5f, 1f))),                  // deleted d5's old neighborhood
      ("q2", Seq(tok(3f, 1f), tok(2f, 0f))))     // d3's OLD neighborhood
    def results(eng: Engine) =
      eng.searchMaxSim("mv", queries, 5)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    val got = results(e)
    val want = results(e2)
    assert(got === want,
      s"maintained multivector serving diverged from rebuild: $got vs $want")
    assert(!got.exists(_._2 == "d5"), s"deleted multivector doc served: $got")
    assert(got.collect { case ("q0", d, 1L) => d } === Seq("d3"),
      "shrink-updated doc must rank first at its new tokens")
    // the shrunk doc's stale 3rd token must not resurrect its old ranking:
    // q2 hits d3's old neighborhood; rebuilt engine never had the old tokens
    val q2got = got.filter(_._1 == "q2"); val q2want = want.filter(_._1 == "q2")
    assert(q2got === q2want, "stale token tail leaked into scoring")
  }

  test("a tombstone sidecar past maxServedTombstones falls back, never serves wrong") {
    val root = testRoot("tomb-bound")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("g", 4, IndexType.Hnsw))
    e.batchUpsertDocuments("g", mkCorpus(30))
    e.buildIndex("g")
    spark.conf.set("spark.graft.maxServedTombstones", "1")
    try {
      e.deleteDocuments("g", Seq("5", "9")) // 2 tombstones > bound of 1
      // layout is stamped current, but the serve path must take the live
      // fallback (beams would widen past the bound) — and stay correct
      val hits = e.searchDocuments("g", Array(5f, 5f, 0f, 0f), 3).map(_.id)
      assert(!hits.contains("5") && !hits.contains("9"),
        s"over-bound tombstones served a deleted id: $hits")
    } finally spark.conf.unset("spark.graft.maxServedTombstones")
  }
}
