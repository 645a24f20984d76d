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
  * integer-only test (population σ over the OBSERVED values, threshold
  * t = tNumer/tDenom):
  *
  *   d²·(n·x − S1)²  >  t²·(n·S2 − S1²)        [d = tDenom, t² = tNumer²]
  *
  * with n = count of non-null values, S1 = Σx, S2 = Σx² per group — every
  * quantity an exact integer aggregate, every comparison exact, so Spark
  * and any SQL engine agree to the last bit. Rational thresholds (e.g.
  * 1.5σ = 3/2) stay exact too.
  *
  * Overflow contract: exact or LOUD, never silently wrong. Values are cast
  * to DECIMAL(19,0) — which holds every long exactly — before squaring, so
  * a per-row square tops out at ~8.5·10³⁷ inside DECIMAL(38,0); only the
  * group sums and the final products can exceed 38 digits (needs
  * d²·(n·x − S1)² or t²·(n·S2 − S1²) ≥ 10³⁸). When they do, ANSI mode
  * (the Spark 4 default) raises on the spot, and with ANSI off the NULL
  * that decimal overflow produces is converted to an explicit error below
  * — an extreme spike can never be silently un-flagged.
  *
  * Scale: one constant-width groupBy over the group key (two decimal sums
  * + a count ride one shuffle) and a broadcast join of the tiny stats
  * frame back onto the stream — the flagging itself is a codegen'd
  * per-row comparison, no window, no second shuffle.
  */
object Outliers {

  /** Flag rows of `df` whose `valCol` (integral) deviates from its
    * `keyCol`-group mean by more than (tNumer/tDenom)·σ. Output: all input
    * columns + `is_outlier` (1/0 long). Rows with a NULL value (or a NULL
    * group key, which no stats row matches) are never outliers and don't
    * contribute to the group's moments. Groups of size 1 have σ = 0 —
    * their single row is never an outlier (0 > 0 fails), matching the
    * math.
    */
  def zScoreFlags(df: DataFrame, keyCol: String, valCol: String,
      tNumer: Int, tDenom: Int): DataFrame = {
    require(tNumer > 0 && tDenom > 0,
      s"threshold must be a positive rational, got $tNumer/$tDenom")
    val dec = "decimal(38,0)"
    val v = col(valCol).cast("decimal(19,0)")
    val stats = df.groupBy(col(keyCol)).agg(
      count(col(valCol)).cast(dec).as("__n"), // observed values only
      sum(v).cast(dec).as("__s1"),
      sum(v * v).cast(dec).as("__s2"))
    val dev = col("__n") * v - col("__s1")
    val lhs = lit(tDenom.toLong * tDenom).cast(dec) * dev * dev
    val rhs = lit(tNumer.toLong * tNumer).cast(dec) *
      (col("__n") * col("__s2") - col("__s1") * col("__s1"))
    df.join(broadcast(stats), Seq(keyCol), "left_outer")
      .withColumn("is_outlier",
        when(col(valCol).isNull || col("__n").isNull, 0L)
          .when(lhs > rhs, 1L)
          .when(lhs <= rhs, 0L)
          // both comparisons NULL ⇔ a decimal product overflowed with ANSI
          // off (ANSI already threw) — refuse to guess
          .otherwise(raise_error(lit(
            "zScoreFlags: decimal(38,0) overflow computing the z-score " +
              "test — group moments too large for exact arithmetic"))))
      .drop("__n", "__s1", "__s2")
  }

  /** Robust (quartile-fence) per-group outlier flags in EXACT arithmetic —
    * the Tukey-fence complement to `zScoreFlags` for heavy-tailed metrics
    * where one extreme value drags the mean/σ themselves (σ-based flags
    * then MISS the spike that caused them; quartiles don't move).
    *
    * Quartiles are percentile_disc-style rank selections (k = ⌈q·n⌉ in
    * integer arithmetic — the same selection `token_quantiles` gates), so
    * p25/p75 are actual data values, and the fence test clears the
    * rational multiplier m = mNumer/mDenom into integers:
    *
    *   flag  ⇔  d·x > d·p75 + m·(p75 − p25)  or  d·x < d·p25 − m·(p75 − p25)
    *
    * [d = mDenom, m = mNumer] — exact in any engine. Tie values make the
    * k-th SMALLEST value deterministic regardless of row_number tie
    * choice. DECIMAL(38,0) arithmetic: int multipliers × long values top
    * out near 10²⁸, far inside range — no overflow path exists.
    *
    * Scale: one per-group window sort (rank selection — no global sort, no
    * collect) + a broadcast join of the two-value stats frame back onto
    * the stream. Groups far larger than a partition would switch to the
    * two-pass histogram form; the window form is right while per-group
    * data fits a partition spill (same stance as `token_quantiles`).
    */
  def iqrFlags(df: DataFrame, keyCol: String, valCol: String,
      mNumer: Int, mDenom: Int): DataFrame = {
    require(mNumer >= 0 && mDenom > 0,
      s"fence multiplier must be a non-negative rational, got $mNumer/$mDenom")
    val dec = "decimal(38,0)"
    val part = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val w = part.orderBy(col(valCol).asc)
    val ranked = df.filter(col(valCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(valCol))
      .withColumn("__rnk", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(part))
    val k25 = expr("(__cnt + 3) div 4")
    val k75 = expr("(__cnt * 3 + 3) div 4")
    val stats = ranked
      .filter(col("__rnk") === k25 || col("__rnk") === k75)
      .groupBy(col(keyCol))
      .agg(
        min(when(col("__rnk") === k25, col(valCol))).cast(dec).as("__p25"),
        min(when(col("__rnk") === k75, col(valCol))).cast(dec).as("__p75"))
    val v = col(valCol).cast(dec)
    val iqrM = lit(mNumer.toLong).cast(dec) * (col("__p75") - col("__p25"))
    val dv = lit(mDenom.toLong).cast(dec) * v
    df.join(broadcast(stats), Seq(keyCol), "left_outer")
      .withColumn("is_outlier",
        when(col(valCol).isNull || col("__p25").isNull, 0L)
          .when(dv > lit(mDenom.toLong).cast(dec) * col("__p75") + iqrM ||
                dv < lit(mDenom.toLong).cast(dec) * col("__p25") - iqrM, 1L)
          .otherwise(0L))
      .drop("__p25", "__p75")
  }
}
