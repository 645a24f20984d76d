package graft

import graft.operators.SnapshotDiff

/** CDC diff classification: added/removed/changed, unchanged suppression,
  * nested-null equality, multi-column compare.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val old_ = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("id", "t", "v")
  private val new_ = Seq(
    (1L, "a", 10.0),   // unchanged → dropped
    (2L, "b", 25.0),   // value changed
    (3L, "x", 30.0),   // type changed
    (5L, "e", 50.0))   // added; 4 removed
    .toDF("id", "t", "v")

  test("classifies added/removed/changed and drops unchanged") {
    val got = SnapshotDiff.diff(old_, new_, "id", Seq("t", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((2L, "changed"), (3L, "changed"),
      (4L, "removed"), (5L, "added")))
  }

  test("old/new column pairs carry both sides' values") {
    val r = SnapshotDiff.diff(old_, new_, "id", Seq("t", "v"))
      .filter($"id" === 2L).collect().head
    assert(r.getString(2) === "b" && r.getDouble(3) === 20.0) // old_t, old_v
    assert(r.getString(4) === "b" && r.getDouble(5) === 25.0) // new_t, new_v
  }

  test("null compare fields are equal to null (unchanged), not changed") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "t")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "t")
    val got = SnapshotDiff.diff(o, n, "id", Seq("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // id 1: null == null → unchanged → dropped; id 2: x → null → changed
    assert(got === Set((2L, "changed")))
  }

  test("rejects empty compare columns") {
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old_, new_, "id", Seq.empty)
    }
  }
}
