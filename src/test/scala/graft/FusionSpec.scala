package graft

import graft.operators.Fusion

/** RRF fusion math: both-list boosting, single-list decay, rank ordering,
  * tie-breaks, top-k truncation.
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  // query 1: doc 10 is rank 1 in BOTH lists; doc 20 only in A; doc 30 only
  // in B (worse rank) — fused order must be 10, 20, 30
  private val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("q", "id", "rnk")
  private val b = Seq((1L, 10L, 1L), (1L, 30L, 3L)).toDF("q", "id", "rnk")

  test("hits in both lists outrank single-list hits; scores are exact") {
    val got = Fusion.rrf(a, b, "q", "id", "rnk", kRrf = 60, topK = 10)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.map(_._1).toSeq === Seq(10L, 20L, 30L))
    assert(got(0)._2 === 2.0 / 61)                // 1/61 + 1/61
    assert(got(1)._2 === 1.0 / 62)                // A only
    assert(got(2)._2 === 1.0 / 63)                // B only, worse rank
  }

  test("score ties break on id ascending") {
    val ta = Seq((1L, 5L, 1L), (1L, 9L, 2L)).toDF("q", "id", "rnk")
    val tb = Seq((1L, 9L, 1L), (1L, 5L, 2L)).toDF("q", "id", "rnk")
    // both docs score 1/61 + 1/62 — id 5 must win rank 1
    val got = Fusion.rrf(ta, tb, "q", "id", "rnk").orderBy("rnk")
      .collect().map(_.getLong(1)).toSeq
    assert(got === Seq(5L, 9L))
  }

  test("topK truncates per query independently") {
    val wide = (1 to 30).map(i => (i % 2L, i.toLong, (i / 2 + 1).toLong))
      .toDF("q", "id", "rnk")
    val got = Fusion.rrf(wide, wide, "q", "id", "rnk", topK = 3)
    assert(got.count() === 6) // 3 per query, 2 queries
    assert(got.filter($"rnk" > 3).count() === 0)
  }

  test("filtered KNN pushes the label predicate into the parquet scan") {
    val plan = graft.queries.VectorQueries.queries("knn_filtered")(spark, sf001)
      .queryExecution.executedPlan.toString
    // the comparison itself must reach PushedFilters — not just IsNotNull
    assert(plan.contains("LessThan(label,5)"), plan)
  }
}
