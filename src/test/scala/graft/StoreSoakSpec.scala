package graft

import java.nio.file.Files

import scala.util.Random

import graft.core.{DocStore, Document}

/** Churn soak (the reference's compaction stress scenario,
  * `script/compact_test.py`): interleaved upserts / deletes / compactions
  * checked against an in-memory reference model after every round.
  */
class StoreSoakSpec extends SparkSpec {

  test("randomized upsert/delete/compact churn matches the reference model") {
    val dir = Files.createTempDirectory("soak").toString
    val store = new DocStore(spark, dir)
    store.init("c")
    val dim = 4
    val rnd = new Random(42)
    val model = scala.collection.mutable.Map.empty[String, Float]

    for (round <- 1 to 12) {
      rnd.nextInt(3) match {
        case 0 => // batch upsert (some fresh ids, some overwrites)
          val docs = (0 until 1 + rnd.nextInt(5)).map { _ =>
            val id = s"id${rnd.nextInt(20)}"
            val x = rnd.nextFloat()
            model(id) = x
            Document(id, Array(x, 0f, 0f, 0f))
          }
          // last occurrence wins within a batch too: dedupe like the store will
          store.upsert("c", docs, dim)
          docs.foreach(d => model(d.id) = d.vector(0))
        case 1 if model.nonEmpty => // delete an existing id
          val id = model.keys.toSeq(rnd.nextInt(model.size))
          store.delete("c", Seq(id), dim)
          model.remove(id)
        case _ => store.compact("c")
      }
      val got = store.read("c").collect()
        .map(r => r.getString(0) -> r.getSeq[Float](1).head).toMap
      assert(got === model.toMap, s"divergence at round $round")
    }
    // final compaction leaves exactly |model| rows in the log
    store.compact("c")
    assert(store.log("c").count() === model.size)
  }
}
