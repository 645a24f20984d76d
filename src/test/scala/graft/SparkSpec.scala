package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one local SparkSession per suite (lazy, reused). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf0001 = "/root/testdata/sf0.001"
  def sf001 = "/root/testdata/sf0.01"
  def sf01 = "/root/testdata/sf0.1"

  /** A fresh engine/store root. Plain local tmp dir by default; with
    * `-Dgraft.testfs=graftfs` every root routes through the non-local
    * Hadoop test scheme instead — the ControlFs-port matrix run (the same
    * specs, control plane on a non-`file:` FileSystem).
    */
  def testRoot(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.props.get("graft.testfs").fold(dir)(scheme => s"$scheme://$dir")
  }

  /** ControlFs of a spec root/path — for spec-side probes of control files
    * that must work under both plain and scheme'd roots.
    */
  def cfsOf(path: String): graft.core.ControlFs =
    graft.core.ControlFs.forRoot(path)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
