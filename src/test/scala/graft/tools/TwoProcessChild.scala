package graft.tools

import graft.core.{DocStore, Document}

/** The SECOND process of the two-JVM write soak (TwoProcessSoakSpec): a
  * bare-JVM writer (no SparkSession — driver-sized batches run entirely on
  * the LocalRunWriter/ControlFs path, so the child starts in ~1 s and
  * exercises exactly the protocol under test) hammering the SAME collection
  * root the parent writes, over a SHARED id space so LWW winners are
  * decided across processes.
  *
  * Args: root coll dim batches seed acksOut [paceMs]
  * `paceMs` > 0 sleeps 0..paceMs between batches — the unleased soak row
  * paces both writers because a SATURATING unleased writer can starve its
  * peer off the collision-retry budget by design (the lease is the
  * liveness layer; see DocStore.withNextVersion).
  * Writes one ack line per committed batch to `acksOut`:
  *   `U <version> id=value,...`  (values in batch order — seq order)
  *   `D <version> id,id,...`
  * and a final `R <writeRetries>` line. The parent replays both processes'
  * acks into the LWW model and asserts the store's final state equals it,
  * and that no version was ever committed twice.
  */
object TwoProcessChild {
  def main(args: Array[String]): Unit = {
    val (Array(root, coll, dimS, batchesS, seedS, acksOut), paceMs) =
      if (args.length == 7) (args.take(6), args(6).toLong) else (args, 0L)
    val dim = dimS.toInt
    val batches = batchesS.toInt
    val seed = seedS.toInt
    val store = new DocStore(null, root)
    val rnd = new scala.util.Random(seed)
    val out = new java.io.PrintWriter(new java.io.FileWriter(acksOut))
    try {
      if (batches == 0) {
        // staleness-probe mode: one known doc at [seed, seed+1, ...] —
        // the parent queries exactly this point after our commit
        val v = store.upsert(coll,
          Seq(Document("winner", Array.tabulate(dim)(i => seed.toFloat + i))), dim)
        out.println(s"U $v winner=${seed.toFloat}")
        out.println(s"R ${store.writeRetries.get}")
        return
      }
      // JIT warmup on a PRIVATE collection: a cold writer's first parquet
      // writes take 50-200 ms — a window spanning many of the peer's
      // commits, which under a disabled lease starves the cold side off
      // the retry budget (the documented saturation/asymmetry caveat).
      // Warm first so the contended phase measures the protocol, not JIT.
      val warm = s"warm$seed"
      store.init(warm)
      (1 to 25).foreach { i =>
        store.upsert(warm, Seq(Document(s"w$i",
          Array.tabulate(dim)(_.toFloat))), dim)
      }
      // start barrier: signal warm, then wait for the parent's GO so the
      // two contended loops actually overlap (child startup + warmup time
      // varies 1-5 s across schemes; without the barrier the loops can
      // miss each other entirely)
      val ready = java.nio.file.Paths.get(acksOut + ".ready")
      val go = java.nio.file.Paths.get(acksOut + ".go")
      java.nio.file.Files.createFile(ready)
      val goDeadline = System.currentTimeMillis() + 120000
      while (!java.nio.file.Files.exists(go)) {
        if (System.currentTimeMillis() > goDeadline)
          sys.error("parent never signalled GO")
        Thread.sleep(5)
      }
      var b = 0
      while (b < batches) {
        b += 1
        if (paceMs > 0) Thread.sleep(rnd.nextLong(paceMs))
        val n = 1 + rnd.nextInt(6)
        val ids = Vector.fill(n)(s"doc-${rnd.nextInt(40)}")
        if (rnd.nextInt(6) == 0) {
          val v = store.deleteVersioned(coll, ids.distinct, dim)
          out.println(s"D $v ${ids.distinct.mkString(",")}")
        } else {
          val docs = ids.zipWithIndex.map { case (id, j) =>
            val x = seed.toFloat * 1e6f + b * 100f + j
            Document(id, Array.tabulate(dim)(i => x + i), Map("b" -> s"$seed-$b"))
          }
          val v = store.upsert(coll, docs, dim)
          out.println(s"U $v ${docs.map(d => s"${d.id}=${d.vector(0)}").mkString(",")}")
        }
      }
      out.println(s"R ${store.writeRetries.get}")
    } finally out.close()
  }
}
