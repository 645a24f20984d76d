package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan '05 — public
  * literature) with DETERMINISTIC md5-derived row hashes: frequency
  * estimation over an unbounded token stream in d×w counters. The
  * distributed form needs no custom aggregate — the counter matrix IS a
  * (row, bucket) groupBy-count (map-side combined, ≤ d·w rows total), and
  * merging partitions is what the shuffle already does. The KMV sketch's
  * companion: KMV answers "how many distinct", CMS answers "how often is
  * THIS one", both in constant memory at 100 TB.
  *
  * Determinism: row r's bucket = two md5 hex nibbles (chars 2r+1, 2r+2) of
  * the value — a pure function any SQL engine reproduces, so estimates
  * (min over d exact integer counters) hash-replay bit-for-bit. Accuracy
  * (overestimate-only, ε·N bound) is spec-gated.
  */
object CountMin {

  val DefaultD = 4
  val W = 256 // two hex nibbles per row hash

  /** Array of `d` bucket ids for `c` (row r ← md5 hex chars 2r+1..2r+2). */
  def buckets(c: Column, d: Int = DefaultD): Column = {
    require(d >= 1 && d <= 8, s"d must be in [1, 8] (md5 has 16 nibble pairs), got $d")
    array((0 until d).map { r =>
      conv(substring(md5(c.cast("binary")), 2 * r + 1, 2), 16, 10).cast("int")
    }: _*)
  }

  /** The counter matrix: (r, bucket, cnt) — at most d·256 rows regardless
    * of stream size.
    */
  def sketch(df: DataFrame, valueCol: String, d: Int = DefaultD): DataFrame =
    df.select(posexplode(buckets(col(valueCol), d)).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Point estimates for `items` (overestimates only): min over the d
    * counters each item hashes into. Items whose bucket never appeared
    * count 0.
    */
  def estimates(counters: DataFrame, items: DataFrame, itemCol: String,
      d: Int = DefaultD): DataFrame =
    items
      .select(col(itemCol), posexplode(buckets(col(itemCol), d)).as(Seq("r", "bucket")))
      .join(broadcast(counters), Seq("r", "bucket"), "left_outer")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
