package graft

import graft.api.Engine
import graft.core._

/** The opt-in bounded-staleness counter-read cache (VERDICT r11 #4,
  * `graft.counter.cacheTtlMs` — see `HadoopControlFs.counterCacheContract`):
  * pins the three contract clauses (own commits always current, foreign
  * commits at most TTL-stale, collisions drop the entry so write retries
  * never burn their budget on a cached value), and MEASURES the choice the
  * knob exists for — serve p50 on a root whose counter-manifest LISTs cost
  * an injected 15 ms (`slowlistfs://`, the object-store LIST stand-in),
  * with the cache off vs on.
  */
class CounterCacheSpec extends SparkSpec {

  private def withTtl[A](ttlMs: Long)(body: => A): A = {
    HadoopControlFs.clearCounterCache()
    val prev = sys.props.put("graft.counter.cacheTtlMs", ttlMs.toString)
    try body
    finally {
      prev match {
        case Some(v) => sys.props.put("graft.counter.cacheTtlMs", v)
        case None => sys.props.remove("graft.counter.cacheTtlMs")
      }
      HadoopControlFs.clearCounterCache()
    }
  }

  private def graftRoot(prefix: String): String =
    s"graftfs://${java.nio.file.Files.createTempDirectory(prefix)}"

  test("contract: own commits always current; foreign commits at most TTL-stale; collision drops the entry") {
    val root = graftRoot("ccache")
    val cfs = ControlFs.forRoot(root)
    val ctr = s"$root/_ctr"
    withTtl(60000) {
      cfs.counterInit(ctr, 0L)
      assert(cfs.counterRead(ctr).contains(0L))
      // own commit: visible immediately despite the 60 s TTL
      cfs.counterCommit(ctr, 1L)
      assert(cfs.counterRead(ctr).contains(1L))
      // foreign commit (another PROCESS: write the manifest entry through
      // the raw FileSystem, bypassing this process's cache)
      val fs = new org.apache.hadoop.fs.Path(ctr)
        .getFileSystem(ControlFs.hadoopConf())
      val e = fs.create(new org.apache.hadoop.fs.Path(s"$ctr.d", f"v${2L}%020d"), false)
      e.write("2".getBytes); e.close()
      assert(cfs.counterRead(ctr).contains(1L),
        "inside the TTL a foreign commit may be invisible — that IS the contract")
      // the bound: after the TTL the foreign value must surface
      HadoopControlFs.clearCounterCache() // stand-in for TTL expiry (clock-free)
      assert(cfs.counterRead(ctr).contains(2L))
      // collision invalidation: our commit of 3 succeeds (cache now 3),
      // foreign writes 4, our commit of 4 collides -> entry dropped ->
      // the very next read sees 4 without waiting out the TTL
      cfs.counterCommit(ctr, 3L)
      val e4 = fs.create(new org.apache.hadoop.fs.Path(s"$ctr.d", f"v${4L}%020d"), false)
      e4.write("4".getBytes); e4.close()
      intercept[CounterCollisionException] { cfs.counterCommit(ctr, 4L) }
      assert(cfs.counterRead(ctr).contains(4L),
        "a collision must drop the cached value immediately")
    }
    // knob off (default): reads are always current
    val fs = new org.apache.hadoop.fs.Path(ctr).getFileSystem(ControlFs.hadoopConf())
    val e5 = fs.create(new org.apache.hadoop.fs.Path(s"$ctr.d", f"v${5L}%020d"), false)
    e5.write("5".getBytes); e5.close()
    assert(cfs.counterRead(ctr).contains(5L))
  }

  test("TTL actually expires (time-based bound, small TTL)") {
    val root = graftRoot("ccache-ttl")
    val cfs = ControlFs.forRoot(root)
    val ctr = s"$root/_ctr"
    withTtl(250) {
      cfs.counterInit(ctr, 0L)
      cfs.counterCommit(ctr, 1L)
      val fs = new org.apache.hadoop.fs.Path(ctr)
        .getFileSystem(ControlFs.hadoopConf())
      val e = fs.create(new org.apache.hadoop.fs.Path(s"$ctr.d", f"v${2L}%020d"), false)
      e.write("2".getBytes); e.close()
      assert(cfs.counterRead(ctr).contains(1L), "fresh: cached own value")
      Thread.sleep(400)
      assert(cfs.counterRead(ctr).contains(2L), "expired: must re-LIST")
    }
  }

  test("write path stays correct with the cache on: a foreign commit costs one collision retry, not the budget") {
    val root = graftRoot("ccache-write")
    withTtl(60000) {
      val store = new DocStore(spark, root)
      store.init("c")
      store.upsert("c", Seq(Document("a", Array(1f, 2f))), 2)
      val v = store.currentVersion("c")
      // foreign process commits v+1 behind our cache's back
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(ControlFs.hadoopConf())
      val e = fs.create(new org.apache.hadoop.fs.Path(
        s"$root/c/_version.d", f"v${v + 1}%020d"), false)
      e.write((v + 1).toString.getBytes); e.close()
      val before = store.writeRetries.get
      store.upsert("c", Seq(Document("b", Array(3f, 4f))), 2)
      assert(store.writeRetries.get == before + 1,
        "exactly one collision: the drop-on-collision rule re-LISTs on retry")
      assert(store.currentVersion("c") == v + 2)
      assert(store.getMany("c", Seq("b")).contains("b"))
    }
  }

  test("measured: serve p50 at a 15 ms counter-manifest LIST, cache off vs on") {
    val dir = java.nio.file.Files.createTempDirectory("ccache-serve")
    val root = s"slowlistfs://$dir"
    val prevSlow = sys.props.put("graft.testfs.slowlist.ms", "0") // fast setup
    try {
      val engine = new Engine(spark, root)
      engine.createCollection(CollectionConfig("s", 16, IndexType.IvfFlat,
        SpaceType.L2, params = Map("nlist" -> "4")))
      val rnd = new scala.util.Random(11)
      (1 to 200).foreach(i => engine.upsertDocument("s",
        Document(s"d$i", Array.fill(16)(rnd.nextFloat()))))
      engine.buildIndex("s", nlist = 4)
      val qs = (1 to 20).map(_ => Array.fill(16)(rnd.nextFloat()))
      def p50(tag: String): Double = {
        qs.foreach(q => engine.searchDocuments("s", q, 5)) // warm cells
        val times = qs.map { q =>
          val t0 = System.nanoTime()
          engine.searchDocuments("s", q, 5)
          (System.nanoTime() - t0) / 1e6
        }.sorted
        info(f"$tag p50 ${times(10)}%.1f ms p95 ${times(18)}%.1f ms")
        times(10)
      }
      sys.props.put("graft.testfs.slowlist.ms", "15")
      val off = withTtl(0)(p50("cache OFF, 15 ms LIST:"))
      val on = withTtl(60000)(p50("cache ON (ttl 60 s), 15 ms LIST:"))
      // each serve pays >= 1 counter LIST without the cache; with it, ~0.
      // Generous bound: the cached p50 must sit at least one injected LIST
      // below the uncached one.
      assert(off - on >= 14.0,
        f"cache must remove the injected LIST cost: off=$off%.1f on=$on%.1f")
    } finally {
      prevSlow match {
        case Some(v) => sys.props.put("graft.testfs.slowlist.ms", v)
        case None => sys.props.remove("graft.testfs.slowlist.ms")
      }
    }
  }
}
