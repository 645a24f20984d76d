package graft

/** Driver-contract smoke: entry() returns rows; every declared query runs at
  * sf0.001 and every oracle key refers to a declared query.
  */
class EntrySmokeSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("oracleSql keys ⊆ queries keys; aliases consistent") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet -- qs
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }
}
