package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with carry-forward interpolation —
  * the gap-filling operator a feature/metrics pipeline runs before training
  * on event streams (pandas' `resample().ffill()`, InfluxDB's
  * `GROUP BY time() FILL(previous)`, expressed as a Spark plan).
  *
  * Construction: (1) one (key, bin) aggregation collapses raw events to at
  * most one row per grid cell (count + last value by the deterministic
  * in-cell order); (2) per-key bounds + `sequence`/`explode` generate the
  * dense spine WITHOUT a per-cell join against raw data; (3) a left join
  * spine⋈cells + a running `last(ignoreNulls)` window carries values
  * across empty cells.
  *
  * Scale: two key shuffles (the cell aggregation and the per-key window —
  * the bounds agg and spine reuse the first) and the spine join; no
  * cross-row explosion beyond the grid itself, whose size is
  * keys × (span/step) — chosen by the caller via `stepTicks`. The spine is
  * generated per key from its OWN bounds, so a single long-lived key never
  * forces a global date range on everyone else. All arithmetic is exact
  * integer tick math — no timestamp rounding ambiguity.
  */
object Resample {

  /** Resample `df` onto a per-key regular grid of `stepTicks` (in the
    * integral unit of `tsCol`), carrying `valueCol` forward through empty
    * cells. In-cell "last" breaks ties by (`tsCol`, `orderCol`) — pass a
    * unique id. Output: key, bin (tick index, i.e. ts div step), n_events
    * (0 on filled cells), value (carried).
    */
  def carryForwardGrid(df: DataFrame, keyCol: String, tsCol: String,
      orderCol: String, valueCol: String, stepTicks: Long): DataFrame = {
    val spineCells = gridCells(df, keyCol, tsCol, orderCol, valueCol, stepTicks)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spineCells
      .select(col(keyCol), col("bin"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("__v"), ignoreNulls = true).over(w).as(valueCol))
  }

  /** Same grid, LINEAR interpolation instead of carry-forward: an empty
    * cell takes `v0 + (v1 − v0)·(bin − b0)/(b1 − b0)` between its nearest
    * observed neighbors (the other classic `resample` fill mode). The
    * formula is per-row IEEE arithmetic in a FIXED operation order — one
    * multiply, one divide, one add on already-exact inputs — so it
    * hash-replays; observed cells reduce to their own value exactly
    * (bin = b0). Same shuffle shape as `carryForwardGrid` plus one more
    * window pass (the forward-looking neighbor).
    */
  def interpolateGrid(df: DataFrame, keyCol: String, tsCol: String,
      orderCol: String, valueCol: String, stepTicks: Long): DataFrame = {
    val spineCells = gridCells(df, keyCol, tsCol, orderCol, valueCol, stepTicks)
    val back = Window.partitionBy(col(keyCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward neighbor = last non-null over a DESCENDING running frame:
    // a [currentRow, unboundedFollowing) frame would make Spark re-scan to
    // the partition end for every row (O(cells²) per key); the descending
    // running frame is the streaming O(cells) evaluator, same semantics
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsBin = when(col("__v").isNotNull, col("bin"))
    spineCells
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pb", last(obsBin, ignoreNulls = true).over(back))
      .withColumn("__nv", last(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nb", last(obsBin, ignoreNulls = true).over(fwd))
      .select(col(keyCol), col("bin"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("__nb") === col("__pb"), col("__pv"))
          .otherwise(col("__pv") +
            (col("__nv") - col("__pv")) * (col("bin") - col("__pb")) /
              (col("__nb") - col("__pb")))
          .as(valueCol))
  }

  /** Shared grid construction: per-cell aggregation + dense per-key spine
    * left-joined back; `n_events`/`__v` are null on gap cells.
    */
  private def gridCells(df: DataFrame, keyCol: String, tsCol: String,
      orderCol: String, valueCol: String, stepTicks: Long): DataFrame = {
    require(stepTicks > 0, s"stepTicks must be positive, got $stepTicks")
    val bin = expr(s"$tsCol div $stepTicks")
    val cells = df
      .groupBy(col(keyCol), bin.as("bin"))
      .agg(
        count(lit(1)).as("n_events"),
        // max_by on the (ts, order) struct = the in-cell LWW winner
        max_by(col(valueCol), struct(col(tsCol), col(orderCol))).as("__v"))
    val bounds = cells.groupBy(col(keyCol))
      .agg(min(col("bin")).as("__b0"), max(col("bin")).as("__b1"))
    val spine = bounds.select(col(keyCol),
      explode(sequence(col("__b0"), col("__b1"))).as("bin"))
    spine.join(cells, Seq(keyCol, "bin"), "left_outer")
  }
}
