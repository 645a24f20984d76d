package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with carry-forward interpolation —
  * the gap-filling operator a feature/metrics pipeline runs before training
  * on event streams (pandas' `resample().ffill()`, InfluxDB's
  * `GROUP BY time() FILL(previous)`, expressed as a Spark plan).
  *
  * Construction: (1) one (key, bin) aggregation collapses raw events to at
  * most one row per grid cell (count + last value by the deterministic
  * in-cell order); (2) one per-key window pass over the OBSERVED cells
  * computes each cell's carried/neighbor values and its successor bin;
  * (3) each observed cell then GENERATES its own grid span in-row
  * (`sequence(bin, next_bin − 1)` + explode) with the fill value computed
  * per generated cell. The dense grid never shuffles: it is born in the
  * output projection.
  *
  * Scale: two key shuffles total — the cell aggregation and the per-key
  * window — both over OBSERVED cells only (the r11 shape added a per-key
  * bounds aggregation, a dense-spine equi-join against the cells, and ran
  * its windows over the full dense grid; guide §2.4: the join and the
  * grid-sized window state were removable outright). The spine is still
  * per key from its OWN bounds — a single long-lived key never forces a
  * global date range on everyone else. All arithmetic is exact integer
  * tick math — no timestamp rounding ambiguity.
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
    val cells = gridCells(df, keyCol, tsCol, orderCol, valueCol, stepTicks)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bin"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `last ignoreNulls` over observed cells == over the dense grid (gap
    // cells contribute nothing); a null-valued observed cell thus carries
    // the previous non-null through itself, exactly as before
    cells
      .withColumn("__carry", last(col("__v"), ignoreNulls = true).over(run))
      .withColumn("__nb", lead(col("bin"), 1).over(w))
      .withColumn("__b", explodedBin)
      .select(col(keyCol), col("__b").as("bin"), gapAwareCount,
        col("__carry").as(valueCol))
  }

  /** Same grid, LINEAR interpolation instead of carry-forward: an empty
    * cell takes `v0 + (v1 − v0)·(bin − b0)/(b1 − b0)` between its nearest
    * observed non-null neighbors (the other classic `resample` fill mode).
    * The formula is per-row IEEE arithmetic in a FIXED operation order —
    * one multiply, one divide, one add on already-exact inputs — so it
    * hash-replays; observed cells reduce to their own value exactly
    * (their previous and next non-null bins coincide). Same shuffle shape
    * as `carryForwardGrid`: the forward-looking neighbor rides a second
    * (descending) window over the observed cells — never the dense grid.
    */
  def interpolateGrid(df: DataFrame, keyCol: String, tsCol: String,
      orderCol: String, valueCol: String, stepTicks: Long): DataFrame = {
    val cells = gridCells(df, keyCol, tsCol, orderCol, valueCol, stepTicks)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bin"))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsBin = when(col("__v").isNotNull, col("bin"))
    def interp(nv: Column, nb: Column): Column =
      when(nb === col("__pb"), col("__pv"))
        .otherwise(col("__pv") +
          (nv - col("__pv")) * (col("__b") - col("__pb")) /
            (nb - col("__pb")))
    cells
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pb", last(obsBin, ignoreNulls = true).over(back))
      .withColumn("__nv", last(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nbv", last(obsBin, ignoreNulls = true).over(fwd))
      .withColumn("__nb", lead(col("bin"), 1).over(w))
      // the forward neighbor of a GENERATED gap cell (bin < __b < next bin)
      // is the NEXT observed cell's at-or-after non-null — lead of __nbv/__nv
      .withColumn("__nnv", lead(col("__nv"), 1).over(w))
      .withColumn("__nnb", lead(col("__nbv"), 1).over(w))
      .withColumn("__b", explodedBin)
      .select(col(keyCol), col("__b").as("bin"), gapAwareCount,
        when(col("__b") === col("bin"), interp(col("__nv"), col("__nbv")))
          .otherwise(interp(col("__nnv"), col("__nnb")))
          .as(valueCol))
  }

  /** Each observed cell generates its own grid span `[bin, next bin)` —
    * the last cell of a key generates just itself.
    */
  private def explodedBin: Column =
    explode(sequence(col("bin"),
      coalesce(col("__nb") - 1L, col("bin"))))

  private def gapAwareCount: Column =
    when(col("__b") === col("bin"), col("n_events")).otherwise(lit(0L))
      .as("n_events")

  /** Shared cell construction: one (key, bin) aggregation over the raw
    * events — at most one row per OBSERVED grid cell.
    */
  private def gridCells(df: DataFrame, keyCol: String, tsCol: String,
      orderCol: String, valueCol: String, stepTicks: Long): DataFrame = {
    require(stepTicks > 0, s"stepTicks must be positive, got $stepTicks")
    val bin = expr(s"$tsCol div $stepTicks")
    df.groupBy(col(keyCol), bin.as("bin"))
      .agg(
        count(lit(1)).as("n_events"),
        // max_by on the (ts, order) struct = the in-cell LWW winner
        max_by(col(valueCol), struct(col(tsCol), col(orderCol))).as("__v"))
  }
}
