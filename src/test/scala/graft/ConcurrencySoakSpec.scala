package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.api.{Engine, Server}
import graft.core._

/** Concurrent-writer wire soak: the ingest/compaction race protocol
  * (intent marker, version fences, probe re-verification — see
  * `Engine.ingestBatchIndexed` / `compactLayout`) hammered by live
  * interleavings instead of crafted ones: parallel REST writers, a deleter,
  * searchers, and an IN-PROCESS compaction loop racing them at the engine
  * level (the REST server itself is deliberately serial, reference
  * semantics — the compactor thread is what creates true engine-level
  * interleaving with the serialized mutations).
  *
  * Invariants asserted:
  *  1. no request or compaction pass ever errors (no torn serve);
  *  2. TombstoneSpec's end state: after the soak, search over whatever the
  *     maintained layout/tombstone/fallback machinery serves is IDENTICAL
  *     to search after a from-scratch buildIndex of the store's own LWW
  *     view — every interleaving may stale the layout (fallback) but must
  *     never lie.
  *
  * Duration: ~15 s by default; set GRAFT_SOAK_SECONDS for longer runs.
  */
class ConcurrencySoakSpec extends SparkSpec {

  test("REST writers + deleter + searchers + engine compaction loop: zero errors; final state ≡ rebuild") {
    val root = testRoot("soak")
    val engine = new Engine(spark, root)
    val server = new Server(engine)
    val port = server.start()
    try {
      val dim = 8
      // tombstoneCompactRows low on purpose: the soak should cross the fold
      // threshold repeatedly, exercising fold-vs-ingest interleavings too
      engine.createCollection(CollectionConfig("soak", dim, IndexType.IvfFlat,
        params = Map("tombstoneCompactRows" -> "400")))
      val pool = (0 until 200).map(_.toString)
      def vec(seed: Int): Array[Float] =
        Array.tabulate(dim)(j => ((seed * 31 + j * 7) % 100) / 10.0f)
      engine.batchUpsertDocuments("soak",
        pool.map(id => Document(id, vec(id.toInt))))
      engine.buildIndex("soak", nlist = 4)

      // a second, MULTIVECTOR collection soaked through the multivectors/*
      // routes concurrently — same invariant, per token row
      engine.createCollection(CollectionConfig("mvsoak", dim, IndexType.IvfFlat,
        params = Map("multivector" -> "true",
          "tombstoneCompactRows" -> "400")))
      val mvPool = (0 until 60).map(i => s"m$i")
      def mvToks(seed: Int): Seq[Array[Float]] =
        (0 to seed % 3).map(t => vec(seed * 7 + t))
      engine.batchUpsertMultiVector("mvsoak",
        mvPool.zipWithIndex.map { case (id, i) => (id, mvToks(i)) })
      engine.buildIndex("mvsoak", nlist = 4)

      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val requests = new java.util.concurrent.atomic.AtomicLong(0)
      val compactions = new java.util.concurrent.atomic.AtomicLong(0)
      val client = HttpClient.newHttpClient()
      def postFull(path: String, body: String): (Int, String) = {
        val r = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build()
        val resp = client.send(r, HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      }
      def post(path: String, body: String): Int = postFull(path, body)._1
      def del(path: String): Int = {
        val r = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .DELETE().build()
        client.send(r, HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      def guard(name: String)(body: => Unit): Runnable = () =>
        try { while (!stop.get()) body }
        catch { case t: Throwable => errors.add(s"$name: $t"); stop.set(true) }

      // PRNGs hoisted OUTSIDE the by-name guard bodies: the body
      // re-evaluates every loop iteration, so an inside `new Random(seed)`
      // re-seeds each pass and the thread hammers ONE fixed id/vector
      // forever (caught in a round-9 self-review; the fuzzing was vacuous)
      def writer(tid: Int): Runnable = {
        val rnd = new scala.util.Random(tid)
        guard(s"writer$tid") {
          val ids = Seq.fill(4)(pool(rnd.nextInt(pool.size))).distinct
          val docs = ids.map(id =>
            s"""{"id":"$id","vector":[${vec(rnd.nextInt(10000)).mkString(",")}]}""")
            .mkString("[", ",", "]")
          val code = post("/v1/collections/soak/documents/batchupsert",
            s"""{"documents":$docs}""")
          if (code != 200) { errors.add(s"writer$tid: HTTP $code"); stop.set(true) }
          requests.incrementAndGet()
        }
      }
      val deleterRnd = new scala.util.Random(99)
      val deleter: Runnable = guard("deleter") {
        val rnd = deleterRnd
        val id = pool(rnd.nextInt(pool.size))
        val code = del(s"/v1/collections/soak/documents/$id")
        if (code != 200 && code != 404) { // 404: already deleted — fine
          errors.add(s"deleter: HTTP $code"); stop.set(true)
        }
        requests.incrementAndGet()
      }
      def searcher(tid: Int): Runnable = {
        val rnd = new scala.util.Random(1000 + tid)
        guard(s"searcher$tid") {
          val (code, respBody) = postFull("/v1/collections/soak/vectors/search",
            s"""{"vector":[${vec(rnd.nextInt(10000)).mkString(",")}],"limit":5}""")
          if (code != 200) {
            errors.add(s"searcher$tid: HTTP $code $respBody"); stop.set(true)
          }
          requests.incrementAndGet()
        }
      }
      // in-process: races the serialized REST mutations at the engine level
      val compactor: Runnable = guard("compactor") {
        engine.compactLayout("soak")
        engine.compact("soak")
        engine.compactLayout("mvsoak")
        engine.compact("mvsoak")
        compactions.incrementAndGet()
        Thread.sleep(300)
      }

      // multivector writers/deleter/searcher over the multivectors/* routes —
      // token-count changes across re-upserts exercise the shrink-trim path
      val mvWriterRnd = new scala.util.Random(7)
      val mvWriter: Runnable = guard("mvWriter") {
        val rnd = mvWriterRnd
        val id = mvPool(rnd.nextInt(mvPool.size))
        val toks = mvToks(rnd.nextInt(10000))
          .map(v => s"[${v.mkString(",")}]").mkString("[", ",", "]")
        val code = post("/v1/collections/mvsoak/multivectors/batchupsert",
          s"""{"documents":[{"id":"$id","vectors":$toks}]}""")
        if (code != 200) { errors.add(s"mvWriter: HTTP $code"); stop.set(true) }
        requests.incrementAndGet()
      }
      val mvDeleterRnd = new scala.util.Random(977)
      val mvDeleter: Runnable = guard("mvDeleter") {
        val rnd = mvDeleterRnd
        val id = mvPool(rnd.nextInt(mvPool.size))
        val code = del(s"/v1/collections/mvsoak/multivectors/$id")
        if (code != 200 && code != 404) { // 404: already deleted — fine
          errors.add(s"mvDeleter: HTTP $code"); stop.set(true)
        }
        requests.incrementAndGet()
      }
      val mvSearcherRnd = new scala.util.Random(31)
      val mvSearcher: Runnable = guard("mvSearcher") {
        val rnd = mvSearcherRnd
        val toks = mvToks(rnd.nextInt(10000))
          .map(v => s"[${v.mkString(",")}]").mkString("[", ",", "]")
        val (code, respBody) = postFull("/v1/collections/mvsoak/multivectors/search",
          s"""{"vectors":$toks,"limit":5}""")
        // 404 "no satisfied results": legal when the deleter raced ahead
        if (code != 200 && code != 404) {
          errors.add(s"mvSearcher: HTTP $code $respBody"); stop.set(true)
        }
        requests.incrementAndGet()
      }

      val threads = (Seq(writer(1), writer(2), deleter,
        searcher(1), searcher(2), compactor,
        mvWriter, mvDeleter, mvSearcher)).map(new Thread(_))
      threads.foreach(_.start())
      val soakMs = sys.env.get("GRAFT_SOAK_SECONDS")
        .map(_.toLong * 1000).getOrElse(15000L)
      Thread.sleep(soakMs)
      // LOAD-AWARE liveness floors: the assertions below test FUNCTION
      // (requests flow, a compaction pass completes — correctly), never
      // RATE. Under heavy co-tenant CPU (another JVM mid-shuffle on the
      // same cores, or sibling suites in the parallel test run) the base
      // window may not fit one 4-call compaction pass — that starved a run
      // into a false "too idle" failure once. Extend up to a hard cap until
      // the floors are met; a functioning engine always meets them.
      val floorDeadline = System.currentTimeMillis + 120000L
      while ((requests.get() <= 10 || compactions.get() == 0) &&
          errors.isEmpty && System.currentTimeMillis < floorDeadline)
        Thread.sleep(500)
      stop.set(true)
      threads.foreach(_.join(180000))
      assert(threads.forall(!_.isAlive), "soak thread failed to stop")
      assert(errors.isEmpty, s"soak errors: ${errors.toArray.mkString("; ")}")
      assert(requests.get() > 10, s"soak too idle: ${requests.get()} requests")
      assert(compactions.get() > 0, "compaction loop never completed a pass")

      // the TombstoneSpec invariant at soak scale: whatever the maintained
      // machinery now serves must equal a from-scratch rebuild of the
      // store's LWW view — staleness is allowed, lying is not
      val queries = (0 until 10).map(i => (s"q$i", vec(i * 13)))
      def snapshot(): Set[(String, String, Double, Long)] =
        engine.searchVectors("soak", queries, 5).collect()
          .map(r => (r.getString(0), r.getString(1),
            r.getDouble(2), r.getLong(3))).toSet
      val served = snapshot()
      engine.buildIndex("soak", nlist = 4)
      val rebuilt = snapshot()
      assert(served === rebuilt,
        "maintained serving diverged from the from-scratch rebuild")
      // same invariant for the multivector collection through searchMaxSim
      val mvQueries = (0 until 5).map(i => (s"q$i", mvToks(i * 11)))
      def mvSnapshot(): Set[(String, String, Long)] =
        engine.searchMaxSim("mvsoak", mvQueries, 5).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val mvServed = mvSnapshot()
      engine.buildIndex("mvsoak", nlist = 4)
      assert(mvServed === mvSnapshot(),
        "maintained multivector serving diverged from the from-scratch rebuild")
    } finally server.stop()
  }
}
