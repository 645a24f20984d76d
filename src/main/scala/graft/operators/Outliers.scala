package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Moment-based per-group outlier flagging in EXACT arithmetic — the
  * anomaly/quality filter a curation pipeline runs over event streams or
  * per-doc metrics before training (the "drop rows more than t·σ from the
  * group mean" rule).
  *
  * The naive form `|x − μ| > t·σ` needs a float mean and a square root —
  * both order-dependent and libm-bound, so neither hash-replays across
  * engines. Squaring and clearing denominators gives the EQUIVALENT
  * integer-only test (population σ, threshold t = tNumer/tDenom):
  *
  *   d²·(n·x − S1)²  >  t²·(n·S2 − S1²)        [d = tDenom, t² = tNumer²]
  *
  * with S1 = Σx, S2 = Σx² per group — every quantity an exact integer
  * aggregate, every comparison exact, so Spark and any SQL engine agree to
  * the last bit. Rational thresholds (e.g. 1.5σ = 3/2) stay exact too.
  *
  * Scale: one constant-width groupBy over the group key (two long sums + a
  * count ride one shuffle) and a broadcast join of the tiny stats frame
  * back onto the stream — the flagging itself is a codegen'd per-row
  * comparison, no window, no second shuffle. Arithmetic is DECIMAL(38,0),
  * so the squares stay exact far past long range: safe while
  * |n·x − S1| < 10¹⁹ and n·S2 < 10³⁷ (e.g. a trillion rows of |x| ≤ 10⁶).
  */
object Outliers {

  /** Flag rows of `df` whose `valCol` (integral) deviates from its
    * `keyCol`-group mean by more than (tNumer/tDenom)·σ. Output: all input
    * columns + `is_outlier` (1/0 long). Groups of size 1 have σ = 0 — their
    * single row is never an outlier (0 > 0 fails), matching the math.
    */
  def zScoreFlags(df: DataFrame, keyCol: String, valCol: String,
      tNumer: Int, tDenom: Int): DataFrame = {
    require(tNumer > 0 && tDenom > 0,
      s"threshold must be a positive rational, got $tNumer/$tDenom")
    val dec = "decimal(38,0)"
    // Σx² via a pre-squared decimal so no intermediate overflows long:
    // v ≤ 1e18 squares inside decimal(38,0) exactly
    val v = col(valCol).cast("decimal(18,0)")
    val stats = df.groupBy(col(keyCol)).agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(col(valCol)).cast(dec).as("__s1"),
      sum(v * v).cast(dec).as("__s2"))
    val dev = col("__n") * col(valCol).cast(dec) - col("__s1")
    val varN = col("__n") * col("__s2") - col("__s1") * col("__s1")
    df.join(broadcast(stats), Seq(keyCol))
      .withColumn("is_outlier",
        when(lit(tDenom.toLong * tDenom).cast(dec) * dev * dev >
             lit(tNumer.toLong * tNumer).cast(dec) * varN, 1L).otherwise(0L))
      .drop("__n", "__s1", "__s2")
  }
}
