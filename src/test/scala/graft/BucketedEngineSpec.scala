package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.Engine
import graft.core.{CollectionConfig, Document, IndexType}

/** Engine-level bucketed inverted-list layout: the `bucketed_table`
  * collection param makes buildIndex ALSO materialize the corpus as an
  * external bucketBy(cluster_id) table, and searchVectorsDf prefer it —
  * corpus-shuffle-free KNN joins that survive engine restarts (the external
  * files are re-registered into a fresh session catalog on first use).
  */
class BucketedEngineSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(n: Int): Seq[Document] = (0 until n).map { i =>
    Document(i.toString, Array.tabulate(8)(j =>
      (if (j == i % 4 * 2) 5f else 0.2f) + (i % 7) * 0.01f))
  }

  private def queries = spark.range(50)
    .select(col("id").cast("string").as("query_id"),
      array((0 until 8).map(j => (rand(j) * 5).cast("float")): _*).as("query_vec"))
    .cache()

  test("bucketed_table: built, preferred by searchVectorsDf, corpus side unshuffled, restart-survivable, staled by writes") {
    spark.sql("DROP TABLE IF EXISTS eng_bucketed_t")
    val root = Files.createTempDirectory("eng-bucketed").toString
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("cb", 8, IndexType.IvfFlat,
      params = Map("bucketed_table" -> "eng_bucketed_t", "buckets" -> "8")))
    e.batchUpsertDocuments("cb", mkDocs(300))
    // twin collection WITHOUT the bucketed layout: deterministic training ⇒
    // identical model ⇒ identical results — the layouts must only change plans
    e.createCollection(CollectionConfig("cp", 8, IndexType.IvfFlat))
    e.batchUpsertDocuments("cp", mkDocs(300))
    e.buildIndex("cb", nlist = 4)
    e.buildIndex("cp", nlist = 4)
    assert(spark.catalog.tableExists("eng_bucketed_t"))

    val q = queries
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val res = e.searchVectorsDf("cb", q, 3)
      val corpusShuffled = res.queryExecution.executedPlan
        .collect { case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x }
        .exists(_.treeString.contains("eng_bucketed_t"))
      assert(!corpusShuffled,
        "bucketed corpus side must feed the KNN-join without an Exchange")
      val got = res.select("query_id", "id", "rnk")
        .as[(String, String, Long)].collect().toSet
      val want = e.searchVectorsDf("cp", q, 3).select("query_id", "id", "rnk")
        .as[(String, String, Long)].collect().toSet
      assert(got === want, "bucketed route must be a pure plan change")

      // restart: a fresh session catalog has no table — the engine must
      // re-register the external files and keep the same results
      spark.sql("DROP TABLE eng_bucketed_t")
      val e2 = new Engine(spark, root)
      val got2 = e2.searchVectorsDf("cb", q, 3).select("query_id", "id", "rnk")
        .as[(String, String, Long)].collect().toSet
      assert(spark.catalog.tableExists("eng_bucketed_t"),
        "fresh engine must re-register the external bucketed table")
      assert(got2 === want)

      // a write after the build stales the bucketed table: search falls back
      // (one tier down) and MUST see the new doc
      val probe = Array(9f, 9f, 9f, 9f, 9f, 9f, 9f, 9f)
      e2.upsertDocument("cb", Document("new", probe))
      val hits = e2.searchDocuments("cb", probe, 1)
      assert(hits.head.id === "new",
        "stale bucketed layout must fall back to a path that sees the write")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS eng_bucketed_t")
    }
  }

  test("a bucketed table name repointed by another collection is never served") {
    spark.sql("DROP TABLE IF EXISTS eng_bucketed_shared")
    val rootA = Files.createTempDirectory("eng-bucketed-a").toString
    val rootB = Files.createTempDirectory("eng-bucketed-b").toString
    val eA = new Engine(spark, rootA)
    val eB = new Engine(spark, rootB)
    try {
      // A and B both claim the same table name; B builds LAST, repointing
      // the catalog entry at B's files
      eA.createCollection(CollectionConfig("ca", 8, IndexType.IvfFlat,
        params = Map("bucketed_table" -> "eng_bucketed_shared")))
      eA.batchUpsertDocuments("ca", mkDocs(120))
      eA.buildIndex("ca", nlist = 2)
      eB.createCollection(CollectionConfig("cb2", 8, IndexType.IvfFlat,
        params = Map("bucketed_table" -> "eng_bucketed_shared")))
      // DIFFERENT corpus (offset ids) so wrong-table results are detectable
      eB.batchUpsertDocuments("cb2", (1000 until 1120).map { i =>
        Document(i.toString, Array.tabulate(8)(j =>
          (if (j == i % 4 * 2) 5f else 0.2f) + (i % 7) * 0.01f))
      })
      eB.buildIndex("cb2", nlist = 2)
      // A's search must NOT serve the repointed table (B's corpus): every
      // returned id must be from A's id range
      val q = queries
      val ids = eA.searchVectorsDf("ca", q, 3)
        .select("id").as[String].collect()
      assert(ids.nonEmpty && ids.forall(_.toInt < 1000),
        s"collection A served another collection's corpus: ${ids.take(5).mkString(",")}")
      // dropping A must leave the table (it now belongs to B's build)
      eA.dropCollection("ca")
      assert(spark.catalog.tableExists("eng_bucketed_shared"),
        "dropCollection must not drop a table repointed by another collection")
    } finally {
      spark.sql("DROP TABLE IF EXISTS eng_bucketed_shared")
    }
  }

  test("dropCollection unregisters the bucketed table") {
    spark.sql("DROP TABLE IF EXISTS eng_bucketed_drop")
    val root = Files.createTempDirectory("eng-bucketed-drop").toString
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("cd", 8, IndexType.IvfFlat,
      params = Map("bucketed_table" -> "eng_bucketed_drop")))
    e.batchUpsertDocuments("cd", mkDocs(40))
    e.buildIndex("cd", nlist = 2)
    assert(spark.catalog.tableExists("eng_bucketed_drop"))
    e.dropCollection("cd")
    assert(!spark.catalog.tableExists("eng_bucketed_drop"))
  }
}
