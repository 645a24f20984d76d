package graft

import java.nio.file.Files

import graft.api.Engine
import graft.core._

/** Regressions for the round-1 self-review findings. */
class ReviewRegressionSpec extends SparkSpec {

  private def freshEngine(): (Engine, String) = {
    val root = Files.createTempDirectory("rr").toString
    (new Engine(spark, root), root)
  }

  test("drop + recreate collection does not serve the old incarnation's cached results") {
    val (e, _) = freshEngine()
    e.createCollection(CollectionConfig("c", 2, IndexType.Flat))
    e.upsertDocument("c", Document("old", Array(0f, 0f)))
    val r1 = e.searchDocuments("c", Array(0f, 0f), 1)
    assert(r1.head.id === "old")
    e.dropCollection("c")
    e.createCollection(CollectionConfig("c", 2, IndexType.Flat))
    e.upsertDocument("c", Document("new", Array(0f, 0f)))
    val r2 = e.searchDocuments("c", Array(0f, 0f), 1) // identical key shape pre-fix
    assert(r2.head.id === "new")
  }

  test("catalog round-trips params containing commas, colons, quotes") {
    val (e, _) = freshEngine()
    val params = Map("desc" -> """a,b:c "quoted" [1,2]""", "name" -> "not-the-collection")
    e.createCollection(CollectionConfig("tricky", 4, IndexType.Flat,
      SpaceType.L2, params))
    val got = e.getCollection("tricky").get
    assert(got.name === "tricky")
    assert(got.dimension === 4)
    assert(got.params === params)
  }

  test("setParams validates nprobe against the persisted nlist after a restart") {
    val (e1, root) = freshEngine()
    e1.createCollection(CollectionConfig("iv", 2, IndexType.IvfFlat))
    e1.batchUpsertDocuments("iv",
      (0 until 20).map(i => Document(i.toString, Array(i.toFloat, 0f))))
    e1.buildIndex("iv", nlist = 4)
    // fresh engine = restart: model only on disk
    val e2 = new Engine(spark, root)
    intercept[IllegalArgumentException](e2.setParams("iv", Map("nprobe" -> 999)))
    e2.setParams("iv", Map("nprobe" -> 4)) // valid bound still accepted
  }

  test("ivfpq with an unsupported space errors at buildIndex instead of wrong rankings") {
    val (e, _) = freshEngine()
    // ip gained a proper ADC formulation; cos remains unsupported → hard error
    e.createCollection(CollectionConfig("pq", 8, IndexType.IvfPq, SpaceType.Cos))
    e.batchUpsertDocuments("pq",
      (0 until 20).map(i => Document(i.toString, Array.fill(8)(i.toFloat))))
    val ex = intercept[IllegalArgumentException](e.buildIndex("pq", nlist = 2))
    assert(ex.getMessage.contains("l2") || ex.getMessage.contains("ip"))
  }
}
