package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.api.Engine
import graft.core.{CollectionConfig, Document, IndexType, SpaceType}

/** Property sweep over the local/distributed parity surface (VERDICT-r10
  * §next #6): the four curated parity specs pin hand-picked edges (ties,
  * U+FFFD ids, deletes); this generates BOUNDED random scenarios — dim,
  * space, nlist, nprobe, k, duplicate-vector tie groups, and
  * delete/overwrite interleavings — across the zero-job serving tiers
  * (ivf_flat, ivfpq, opq, routed graph) and asserts the local serve is
  * row-identical to the distributed plan on every one. Scenario generation
  * is scalacheck `Gen` under FIXED seeds: failures replay exactly (the
  * failing seed is in the test name's scenario dump), and suite time stays
  * bounded.
  */
class LocalParityPropertySpec extends SparkSpec {

  private case class Scenario(
      seedId: Long, dim: Int, space: SpaceType, nDocs: Int, nlist: Int,
      nprobe: Int, k: Int, nTieGroups: Int, deletes: Int, overwrites: Int,
      nQueries: Int)

  private def scenarioGen(spaces: Seq[SpaceType]): Gen[Scenario] = for {
    dim <- Gen.oneOf(4, 8, 12) // divisible by m=4 (pq/opq subspaces)
    space <- Gen.oneOf(spaces)
    nDocs <- Gen.choose(24, 70)
    nlist <- Gen.choose(2, 5)
    nprobe <- Gen.choose(1, 5)
    k <- Gen.choose(1, 8)
    nTieGroups <- Gen.choose(0, 3)
    deletes <- Gen.choose(0, 3)
    overwrites <- Gen.choose(0, 2)
    nQueries <- Gen.choose(1, 3)
  } yield Scenario(0L, dim, space, nDocs, nlist, math.min(nprobe, nlist), k,
    nTieGroups, deletes, overwrites, nQueries)

  private def scenarios(spaces: Seq[SpaceType], n: Int, seedBase: Long): Seq[Scenario] =
    (0 until n).flatMap { i =>
      scenarioGen(spaces)(Gen.Parameters.default, Seed(seedBase + i))
        .map(_.copy(seedId = seedBase + i))
    }

  /** Random corpus: `nTieGroups` groups of 3 docs share one exact vector
    * (ties must break by UTF-8 id order on BOTH paths); vectors avoid the
    * cos zero-norm edge unless the group plants it.
    */
  private def corpusOf(s: Scenario, rnd: scala.util.Random): IndexedSeq[Document] = {
    val base = (0 until s.nDocs).map { i =>
      Document(f"d$i%03d", Array.fill(s.dim)(rnd.nextFloat() * 2f - 1f),
        Map("tag" -> (i % 3).toString))
    }
    val ties = (0 until s.nTieGroups).flatMap { g =>
      val tv = Array.fill(s.dim)(rnd.nextFloat())
      Seq(Document(s"tie$g-a", tv, Map("tag" -> "0")),
        Document(s"tie$g-b", tv, Map("tag" -> "1")),
        Document(s"tie$g-😀$g", tv, Map("tag" -> "2")))
    }
    base ++ ties
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Double, Long)] =
    df.select(col("query_id").cast("string"), col("id").cast("string"),
        col("distance"), col("rnk"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  /** Local route (distinct qids, point-sized) vs the distributed plan
    * (forced by a duplicated pad qid — the local route declines dup qids).
    */
  private def assertParity(e: Engine, coll: String, s: Scenario,
      queries: Seq[(String, Array[Float])]): Unit = {
    val local = rowsOf(e.searchVectors(coll, queries, s.k))
    val padded = Seq(("__pad", queries.head._2), ("__pad", queries.head._2)) ++ queries
    val dist = rowsOf(e.searchVectors(coll, padded, s.k))
      .filterNot(_._1 == "__pad")
    assert(local === dist,
      s"local ≠ distributed for scenario $s\nlocal: $local\ndist: $dist")
  }

  private def runScenario(s: Scenario, it: IndexType,
      params: Map[String, String]): Unit = {
    val rnd = new scala.util.Random(s.seedId)
    val root = testRoot(s"parityprop")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", s.dim, it, s.space, params))
    val docs = corpusOf(s, rnd)
    e.batchUpsertDocuments("c", docs)
    e.buildIndex("c", nlist = s.nlist)
    if (it == IndexType.Hnsw) {
      val nl = params("routeNlist").toInt
      e.setParams("c", Map("routeNprobe" -> math.min(s.nprobe, nl)))
    } else e.setParams("c", Map("nprobe" -> s.nprobe))
    def someQueries(): Seq[(String, Array[Float])] =
      (0 until s.nQueries).map { qi =>
        // half the queries aim at existing docs (tie groups included),
        // half at random points
        val qv = if (rnd.nextBoolean() && docs.nonEmpty)
          docs(rnd.nextInt(docs.size)).vector
        else Array.fill(s.dim)(rnd.nextFloat() * 2f - 1f)
        (s"q$qi", qv)
      }
    assertParity(e, "c", s, someQueries())
    // mutation interleaving: maintained deletes + overwrites (tombstone
    // sidecars, delta appends on the graph tier), then parity again
    val victims = rnd.shuffle(docs.map(_.id)).take(s.deletes)
    if (victims.nonEmpty) e.deleteDocuments("c", victims)
    (0 until s.overwrites).foreach { _ =>
      val id = docs(rnd.nextInt(docs.size)).id
      e.upsertDocument("c", Document(id,
        Array.fill(s.dim)(rnd.nextFloat() * 2f - 1f), Map("tag" -> "9")))
    }
    if (s.deletes + s.overwrites > 0) assertParity(e, "c", s, someQueries())
    e.dropCollection("c")
  }

  test("property: ivf_flat local ≡ distributed across random scenarios + mutations") {
    scenarios(Seq(SpaceType.L2, SpaceType.Ip, SpaceType.Cos, SpaceType.Hamming),
        n = 6, seedBase = 41000L)
      .foreach(s => runScenario(s, IndexType.IvfFlat, Map.empty))
  }

  test("property: ivfpq local ≡ distributed across random scenarios + mutations") {
    scenarios(Seq(SpaceType.L2, SpaceType.Ip, SpaceType.Cos),
        n = 5, seedBase = 42000L)
      .foreach(s => runScenario(s, IndexType.IvfPq, Map("m" -> "4")))
  }

  test("property: opq local ≡ distributed across random scenarios + mutations") {
    scenarios(Seq(SpaceType.L2, SpaceType.Ip, SpaceType.Cos),
        n = 4, seedBase = 43000L)
      .foreach(s => runScenario(s, IndexType.Opq, Map("m" -> "4")))
  }

  test("property: routed graph local ≡ distributed across random scenarios + mutations") {
    scenarios(Seq(SpaceType.L2, SpaceType.Ip, SpaceType.Cos),
        n = 4, seedBase = 44000L)
      .foreach(s => runScenario(s, IndexType.Hnsw, Map("routeNlist" -> "3")))
  }
}
