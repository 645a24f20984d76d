package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot join keys.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; for the
  * equi-joins our operators generate against *replicable* right sides (LSH
  * buckets, band hashes, probe lists), explicit salting bounds the worst-case
  * partition deterministically: the skewed left side gets a random salt in
  * [0, factor), the right side is replicated across all salts, and the join
  * key becomes (key, salt) — a hot key's rows land on `factor` partitions
  * instead of one.
  */
object Skew {

  /** Inner equi-join `left ⋈ right` on `keys`, salted: left rows are
    * scattered over `factor` sub-keys (deterministic per-row hash, not
    * rand(), so retries/recomputation stay stable), right rows replicated.
    * Use when one side is small enough to replicate `factor`× and the other
    * has hot keys.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val keyCols = keys.map(col)
    // deterministic scatter: hash of the whole left row modulo factor
    val leftSalted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(factor)))
    val rightReplicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    leftSalted.join(rightReplicated, keys :+ "__salt").drop("__salt")
  }

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

  /** Top-n hot keys of a column with their counts — the driver-side probe a
    * pipeline runs to decide whether salting is warranted.
    */
  def hotKeys(df: DataFrame, key: Column, n: Int = 10): Array[(Any, Long)] =
    df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc)
      .limit(n)
      .collect()
      .map(r => (r.get(0), r.getLong(1)))
}
