package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Skew/parallelism handling for keyed stages.
  *
  * AQE's skew-join splitting covers oversized join partitions at runtime;
  * the remaining gap our operators hit is the OPPOSITE regime — stages whose
  * per-row compute dominates their bytes, which AQE's byte-based coalescing
  * serializes onto one or two tasks. `spreadByKey` is the explicit keyed
  * repartition for those sites. (A `saltedJoin`/`hotKeys` API lived here
  * through r12 but never earned a production call site — hot LSH buckets are
  * handled by `Dedup.capBuckets` and ordinary join skew by AQE — so it was
  * removed rather than kept as dead public API.)
  */
object Skew {

  /** Key-hash repartition with an EXPLICIT partition count, for stages whose
    * per-ROW compute dominates their bytes (session windows over event
    * streams, bin joins that expand after the shuffle read): AQE's
    * byte-based coalescing sizes post-shuffle partitions for tens of MB of
    * INPUT, which serializes compute-heavy-but-small inputs onto one or two
    * tasks (measured at sf0.1: the sessionize window ran 100k rows
    * single-threaded behind a 1.6 MB exchange). An explicit count is exempt
    * from coalescing, and hash-partitioning on the downstream key means the
    * window/aggregation above it reuses this exchange — ENSURE_REQUIREMENTS
    * adds nothing, so the stage count is unchanged.
    *
    * Scale-adaptive, not local-tuned: the count is
    * max(defaultParallelism, spark.sql.shuffle.partitions) — locally that is
    * the core count the driver configures; on a real cluster it is the
    * admin-sized shuffle width, i.e. exactly what this shuffle would have
    * used before AQE coalescing. The trade (stated): this exchange forgoes
    * AQE coalescing — correct for per-row-heavy operators, wrong for plain
    * byte-bound scans, so callers opt in per site.
    */
  def spreadByKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    df.repartition(n, keys.map(col): _*)
  }
}
