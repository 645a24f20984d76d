package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._

/** Engine-dispatch profile of the MAINTAINED point write (the REST insert/
  * update floor): replicates RecallBench's rest_insert_maintained setup
  * (hnsw routed collection over sf0.01 embeddings) minus the wire, and
  * times engine.upsertDocument for fresh-id inserts and overwrites.
  *
  *   sbt -batch 'Test/runMain graft.tools.WriteProfile'
  */
object WriteProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .appName("write-profile")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("write-prof").toString
    val engine = new graft.api.Engine(spark, root)
    engine.createCollection(CollectionConfig("w", 64, IndexType.Hnsw,
      SpaceType.L2, params = Map("routeNlist" -> "32")))
    val docs = emb.collect().map(r => Document(r.getLong(0).toString,
      r.getAs[scala.collection.Seq[Float]](1).toArray))
    engine.batchUpsertDocuments("w", docs.toSeq)
    engine.buildIndex("w")
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(64)(rnd.nextFloat())
    def p(tag: String, xs: Seq[Double]): Unit = {
      val t = xs.sorted
      println(f"[wprof] $tag p50 ${t(t.size / 2)}%.1f ms p95 ${t((t.size * 95) / 100)}%.1f ms")
    }
    engine.upsertDocument("w", Document("warm", vec())) // warm path
    p("insert fresh-id", (0 until 40).map { i =>
      val t0 = System.nanoTime()
      engine.upsertDocument("w", Document(s"n$i", vec()))
      (System.nanoTime() - t0) / 1e6
    })
    p("update existing", (0 until 40).map { i =>
      val t0 = System.nanoTime()
      engine.upsertDocument("w", Document(docs(i).id, vec()))
      (System.nanoTime() - t0) / 1e6
    })
    spark.stop()
  }
}
