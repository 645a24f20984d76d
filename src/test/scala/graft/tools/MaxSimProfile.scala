package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._

/** Phase profile of the zero-job MaxSim serve (VERDICT r11 #3) — replicates
  * RecallBench's serve_mv setup (sf0.01 embeddings, 4 tokens/doc, nlist 16,
  * nprobe 4, maxsimCandM 16) and times `Engine.searchMaxSim` per query with
  * `-Dgraft.profile.maxsim=true` phase laps on stderr.
  *
  *   sbt -batch -Dgraft.profile.maxsim=true 'Test/runMain graft.tools.MaxSimProfile'
  */
object MaxSimProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .appName("maxsim-profile")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("maxsim-prof").toString
    val engine = new graft.api.Engine(spark, root)
    engine.createCollection(CollectionConfig("mv", 64, IndexType.IvfFlat,
      SpaceType.L2, params = Map("multivector" -> "true")))
    val T = 4
    val docs = emb.collect().map(r => Document(r.getLong(0).toString,
      r.getAs[scala.collection.Seq[Float]](1).toArray))
    val mvDocs = docs.grouped(T).zipWithIndex
      .map { case (g, i) => (s"d$i", g.map(_.vector).toSeq) }.toSeq
    println(s"[prof] ${mvDocs.size} docs x $T tokens")
    engine.batchUpsertMultiVector("mv", mvDocs)
    engine.buildIndex("mv", nlist = 16)
    engine.setParams("mv", Map("nprobe" -> 4, "maxsimCandM" -> 16))
    val qs = mvDocs.take(20).map(_._2)
    qs.zipWithIndex.foreach { case (q, i) =>
      engine.searchMaxSim("mv", Seq((s"w$i", q)), 10).collect()
    } // warm
    System.err.println("[prof] ---- timed ----")
    val times = qs.zipWithIndex.map { case (q, i) =>
      val t0 = System.nanoTime()
      engine.searchMaxSim("mv", Seq((s"q$i", q)), 10).collect()
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[prof] p50 ${times(times.size / 2)}%.1f ms  p95 ${times(18)}%.1f ms")
    // micro: where does a single getMany go?
    val ids = (0 until 47).map(i => s"d${i * 7}0") ++
      (0 until 47).flatMap(i => (1 until 4).map(j => s"d${i * 7}$j"))
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val got = engine.fetchDocuments("mv", ids)
      System.err.println(f"[micro] getMany ${ids.size} ids -> ${got.size} rows ${(System.nanoTime() - t0) / 1e6}%.2f ms")
    }
    // bare parquet-mr open+drain of the compacted file with the same in()
    val dataDir = java.nio.file.Paths.get(root, "mv")
    val gen = java.nio.file.Files.list(dataDir).iterator()
    import scala.jdk.CollectionConverters._
    val dirs = java.nio.file.Files.list(dataDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("data")).toSeq
    dirs.foreach { d =>
      java.nio.file.Files.list(d).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { f =>
          import org.apache.parquet.filter2.predicate.FilterApi
          import org.apache.parquet.io.api.Binary
          val pred = FilterApi.in(FilterApi.binaryColumn("id"),
            ids.map(Binary.fromString).toSet.asJava
              .asInstanceOf[java.util.Set[Binary]])
          val pred4 = FilterApi.in(FilterApi.binaryColumn("id"),
            ids.take(4).map(Binary.fromString).toSet.asJava
              .asInstanceOf[java.util.Set[Binary]])
          val conf = new org.apache.hadoop.conf.Configuration()
          for ((tag, fl) <- Seq(("nofilter", None), ("in4", Some(pred4)),
              ("in188", Some(pred))); _ <- 1 to 3) {
            val t0 = System.nanoTime()
            var b = org.apache.parquet.hadoop.ParquetReader.builder(
              new org.apache.parquet.hadoop.example.GroupReadSupport(),
              new org.apache.hadoop.fs.Path(f.toString)).withConf(conf)
            fl.foreach(p => b = b.withFilter(
              org.apache.parquet.filter2.compat.FilterCompat.get(p)))
            val r = b.build()
            val tOpen = System.nanoTime()
            var n = 0
            try { while (r.read() != null) n += 1 } finally r.close()
            System.err.println(f"[micro] $tag ${f.getFileName} rows=$n open=${(tOpen - t0) / 1e6}%.1f drain=${(System.nanoTime() - tOpen) / 1e6}%.1f ms")
          }
        }
    }
    spark.stop()
  }
}
