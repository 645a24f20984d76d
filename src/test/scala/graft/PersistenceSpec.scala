package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.Engine
import graft.core._
import graft.operators.{IvfIndex, IvfPq}

/** S8 snapshot persistence + recovery, result-cache correctness, extensions
  * registration, and physical partition pruning on the IVF layout.
  */
class PersistenceSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int) = {
    (0 until n).map { i =>
      val base = if (i % 2 == 0) 0f else 10f
      (i.toString, Seq.tabulate(8)(j => base + (i % 5) * 0.1f + j * 0.01f))
    }.toDF("id", "vector")
  }

  test("ivf/pq snapshots round-trip bit-exactly") {
    val corpus = clustered(80)
    val ivf = IvfIndex.train(corpus, "vector", nlist = 3)
    val dir = testRoot("snap")
    ModelStore.saveIvf(s"$dir/ivf.snapshot", ivf)
    val ivf2 = ModelStore.loadIvf(s"$dir/ivf.snapshot").get
    assert(ivf2.space === ivf.space)
    assert(ivf2.centroids.map(_.toSeq).toSeq === ivf.centroids.map(_.toSeq).toSeq)

    val pq = IvfPq.train(corpus, "vector", nlist = 2, m = 2, nbits = 4)
    ModelStore.savePq(s"$dir/pq.snapshot", pq)
    val pq2 = ModelStore.loadPq(s"$dir/pq.snapshot").get
    assert(pq2.m === pq.m && pq2.subDim === pq.subDim)
    assert(pq2.coarse.centroids.map(_.toSeq).toSeq === pq.coarse.centroids.map(_.toSeq).toSeq)
    assert(pq2.codebooks.map(_.map(_.toSeq).toSeq).toSeq === pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(ModelStore.loadIvf(s"$dir/absent") === None)
  }

  test("engine recovery: a NEW engine over the same root searches a built ivf index") {
    val root = testRoot("engine-recover")
    val e1 = new Engine(spark, root)
    e1.createCollection(CollectionConfig("c", 8, IndexType.IvfFlat))
    val docs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0f else 10f
      Document(i.toString, Array.tabulate(8)(j => base + (i % 5) * 0.1f))
    }
    e1.batchUpsertDocuments("c", docs)
    e1.buildIndex("c", nlist = 2)
    // fresh engine = process restart; model must come back from the snapshot
    val e2 = new Engine(spark, root)
    val hits = e2.searchDocuments("c", docs.head.vector, 3)
    assert(hits.head.id === "0")
  }

  test("result cache: hit on repeat, invalidated by writes and setParams") {
    val root = testRoot("engine-cache")
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 3, IndexType.Flat))
    e.upsertDocument("c", Document("1", Array(1f, 2f, 3f)))
    e.upsertDocument("c", Document("2", Array(4f, 5f, 6f)))

    val r1 = e.searchDocuments("c", Array(1f, 2f, 3f), 2)
    assert(e.cacheSize === 1)
    val r2 = e.searchDocuments("c", Array(1f, 2f, 3f), 2) // hit
    assert(r2 === r1 && e.cacheSize === 1)

    // write → version bump → stale entry cannot be served
    e.upsertDocument("c", Document("3", Array(1f, 2f, 3f)))
    val r3 = e.searchDocuments("c", Array(1f, 2f, 3f), 2)
    assert(r3.map(_.id).contains("3"), "post-write search must see the new doc")
    assert(e.cacheSize === 2) // new key, old one ages out of the LRU
  }

  test("extensions: distance functions usable from spark.sql via GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate would return the suite's session (ignoring withExtensions);
    // clear active/default so a NEW session (same context) applies them
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = s2.sql(
        "SELECT l2_sq(array(1.0F,2.0F,3.0F), array(4.0F,5.0F,6.0F)) AS d").collect()(0).getDouble(0)
      assert(got === 27.0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("IVF written layout: probed scan reads only probed partitions (physical pruning)") {
    val corpus = clustered(100)
    val model = IvfIndex.train(corpus, "vector", nlist = 2)
    val dir = testRoot("ivf-layout") + "/idx"
    IvfIndex.write(corpus, "vector", model, dir)
    val loaded = spark.read.parquet(dir)
    val q = loaded.filter(col("cluster_id") === 0)
    q.count() // execute so the scan node carries final metrics
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    // physical evidence: the scan enumerates only the probed partition dirs
    assert(scan.metadata("PartitionFilters").contains("cluster_id"),
      s"no cluster_id partition filter: ${scan.metadata("PartitionFilters")}")
    val readPartitions = scan.selectedPartitions.partitionCount
    assert(readPartitions === 1, s"expected 1 partition dir read, got $readPartitions")
  }
}
