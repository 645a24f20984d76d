package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=<name,name,...>: dump only these queries (local
    // focused replays; the driver never sets it, so its gate stays full)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(q => wanted(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // oracle-input tables (deterministic candidate/probe sets) — written to
    // a SIBLING of outDir so the driver's outDir listing never sees them as
    // a query entry (an in-outDir `_aux` kept showing up as a no-oracle row
    // in CORRECTNESS_r*.json); oracleSql references the absolute path via
    // the {AUX} placeholder, so location is otherwise immaterial
    val auxDir = outDir.stripSuffix("/") + "_aux"
    SparkEntry.oracleInputs.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$auxDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] aux $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // {AUX} resolves to the absolute aux-table dir of THIS run, so the
    // dumped SQL is directly runnable by the driver's DuckDB gate
    val auxAbs = Paths.get(auxDir).toAbsolutePath.toString
    // focused runs dump only the focused oracles too: a checker pointed at
    // a previously-populated outDir then ignores stale query dirs entirely
    // (it iterates the oracle map) instead of gating on results that never
    // re-ran under the current code
    val json = SparkEntry.oracleSql.filter(o => wanted(o._1))
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{AUX}", auxAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
