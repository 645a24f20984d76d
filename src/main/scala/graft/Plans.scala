package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-dump main (optimization-round diagnosis aid): writes
  * `.explain("formatted")` output for the named SparkEntry queries to
  * `<outDir>/<query>.txt`. Usage:
  *
  *   sbt "runMain graft.Plans <sfDir> <outDir> [q1,q2,...]"
  *
  * With no query list, dumps every declared query. The session mirrors
  * Bench's configuration so the captured plans are the plans the bench
  * actually runs (same AQE / shuffle-partition settings).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/out"
    val only = if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plans")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"$name.txt"), plan.getBytes("UTF-8"))
          System.err.println(s"[plans] $name: ${plan.linesIterator.size} lines")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plans] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
