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
    val root = testRoot("eng-bucketed")
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

  test("quantized tiers get bucketed layouts too: pq results equal the twin, corpus side unshuffled") {
    spark.sql("DROP TABLE IF EXISTS eng_bucketed_pq")
    val root = testRoot("eng-bucketed-pq")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("qp", 8, IndexType.IvfPq,
      params = Map("bucketed_table" -> "eng_bucketed_pq", "buckets" -> "8")))
    e.batchUpsertDocuments("qp", mkDocs(300))
    e.createCollection(CollectionConfig("qn", 8, IndexType.IvfPq))
    e.batchUpsertDocuments("qn", mkDocs(300))
    e.buildIndex("qp", nlist = 4)
    e.buildIndex("qn", nlist = 4)
    assert(spark.catalog.tableExists("eng_bucketed_pq"))
    val q = queries
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val res = e.searchVectorsDf("qp", q, 3)
      val corpusShuffled = res.queryExecution.executedPlan
        .collect { case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x }
        .exists(_.treeString.contains("eng_bucketed_pq"))
      assert(!corpusShuffled,
        "bucketed encoded corpus must feed the ADC join without an Exchange")
      val got = res.select("query_id", "id", "rnk")
        .as[(String, String, Long)].collect().toSet
      val want = e.searchVectorsDf("qn", q, 3).select("query_id", "id", "rnk")
        .as[(String, String, Long)].collect().toSet
      assert(got === want, "bucketed pq route must be a pure plan change")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS eng_bucketed_pq")
    }
  }

  test("streaming maintenance keeps the bucketed table current (insert-only batches append bucketed)") {
    spark.sql("DROP TABLE IF EXISTS eng_bucketed_stream")
    val root = testRoot("eng-bucketed-stream")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("cs", 8, IndexType.IvfFlat,
      params = Map("bucketed_table" -> "eng_bucketed_stream", "buckets" -> "4")))
    e.batchUpsertDocuments("cs", mkDocs(100))
    e.buildIndex("cs", nlist = 2)
    val probe = Array(9f, 9f, 9f, 9f, 9f, 9f, 9f, 9f)
    val b = Seq(("new", probe.toSeq, Map.empty[String, String]))
      .toDF("id", "vector", "params")
    e.ingestBatchIndexed("cs", b, assumeNewIds = true, batchId = Some(0L))
    // the batch's row must have landed IN the bucketed table, and the table
    // must still be the serving path (meta stamp advanced with the batch)
    assert(spark.table("eng_bucketed_stream").filter(col("id") === "new").count() === 1L,
      "insert-only batch must append to the bucketed table")
    val res = e.searchVectorsDf("cs",
      Seq(("q", probe.toSeq)).toDF("query_id", "query_vec")
        .select(col("query_id"), col("query_vec").cast("array<float>").as("query_vec")), 1)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("eng_bucketed_stream"),
      "post-batch search must still serve the (maintained) bucketed table")
    assert(res.select("id").as[String].collect().head === "new")
    // small-files compaction rebuilds the bucketed table too, under the same
    // stamp: the table stays the serving path with the full row set
    val rowsPre = spark.table("eng_bucketed_stream").count()
    assert(e.compactLayout("cs"), "compaction must run on the current layout")
    assert(spark.table("eng_bucketed_stream").count() === rowsPre,
      "compaction changed the bucketed table's row set")
    val res2 = e.searchVectorsDf("cs",
      Seq(("q", probe.toSeq)).toDF("query_id", "query_vec")
        .select(col("query_id"), col("query_vec").cast("array<float>").as("query_vec")), 1)
    assert(res2.queryExecution.executedPlan.toString.contains("eng_bucketed_stream"),
      "post-compaction search must still serve the bucketed table")
    assert(res2.select("id").as[String].collect().head === "new")
    spark.sql("DROP TABLE IF EXISTS eng_bucketed_stream")
  }

  test("a bucketed table name repointed by another collection is never served") {
    spark.sql("DROP TABLE IF EXISTS eng_bucketed_shared")
    val rootA = testRoot("eng-bucketed-a")
    val rootB = testRoot("eng-bucketed-b")
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
    val root = testRoot("eng-bucketed-drop")
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
