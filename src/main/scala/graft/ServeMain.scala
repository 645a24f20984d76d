package graft

import org.apache.spark.sql.SparkSession

import graft.api.{Engine, Server}
import graft.sources.FakeEmbeddingProvider

/** Standalone REST server entry point (SURVEY §7.1 api/server.scala):
  *   runMain graft.ServeMain [port] [rootDir] [embedDim]
  * Prints the bound port on stdout and serves until killed.
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(0)
    val root = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-serve").toString)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val server = new Server(new Engine(spark, root, Some(new FakeEmbeddingProvider(dim))))
    val bound = server.start()
    println(s"[serve] listening on 127.0.0.1:$bound root=$root")
    Thread.currentThread().join()
  }
}
