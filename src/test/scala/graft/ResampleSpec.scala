package graft

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Regular-grid carry-forward resampling on crafted series: spine bounds,
  * gap filling, in-cell last-write-wins tie-break, single-point keys, and
  * per-key spine independence.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, id, value) with step 10: key "a" spans bins 0..4 with a gap
  // at 1, 3; two rows tie into bin 2 (ids 4 < 5 — id 5 must win)
  private val rows = Seq(
    ("a", 0L, 1L, 1.0),
    ("a", 25L, 4L, 2.0), ("a", 25L, 5L, 3.0), // same ts — orderCol decides
    ("a", 44L, 6L, 4.0),
    ("b", 100L, 7L, 9.0)) // single-point key: spine is exactly one bin
  private def df = rows.toDF("k", "ts", "id", "v")

  private def grid = Resample.carryForwardGrid(df, "k", "ts", "id", "v", 10L)
    .orderBy("k", "bin").collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("dense spine per key, gaps filled with carried value and n=0") {
    assert(grid.toSeq === Seq(
      ("a", 0L, 1L, 1.0),
      ("a", 1L, 0L, 1.0), // gap: carried
      ("a", 2L, 2L, 3.0), // tie: id 5 wins
      ("a", 3L, 0L, 3.0), // gap: carried
      ("a", 4L, 1L, 4.0),
      ("b", 10L, 1L, 9.0)))
  }

  test("keys never leak into each other's spines") {
    // key b must not inherit bins 0..4 from key a despite the shared frame
    assert(grid.count(_._1 == "b") === 1)
  }

  test("rejects a non-positive step") {
    intercept[IllegalArgumentException] {
      Resample.carryForwardGrid(df, "k", "ts", "id", "v", 0L)
    }
  }

  test("linear interpolation: gaps take the straight line, observed cells exact") {
    // key a: observed bins 0 (v=1.0), 2 (v=3.0), 5 (v=9.0) → bin 1 = 2.0,
    // bins 3,4 = 5.0, 7.0 (line from 3.0 at bin 2 to 9.0 at bin 5)
    val rows = Seq(
      ("a", 0L, 1L, 1.0), ("a", 25L, 2L, 3.0), ("a", 55L, 3L, 9.0),
      ("b", 100L, 7L, 4.0)) // single observation: nb = pb → its own value
    val got = Resample.interpolateGrid(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", 10L)
      .orderBy("k", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", 0L, 1L, 1.0),
      ("a", 1L, 0L, 2.0),
      ("a", 2L, 1L, 3.0),
      ("a", 3L, 0L, 5.0),
      ("a", 4L, 0L, 7.0),
      ("a", 5L, 1L, 9.0),
      ("b", 10L, 1L, 4.0)))
  }
}
