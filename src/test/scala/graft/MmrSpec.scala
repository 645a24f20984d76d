package graft

import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.operators.{ExactKnn, Mmr}

/** MMR diversified re-ranking: reduction to plain top-k at λ=1, the
  * diversity property on duplicate-heavy candidates, determinism, and
  * structural invariants (k rows per query, subset of candidates, step
  * ordering).
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))
  private lazy val cands = ExactKnn.knn(emb, queries, 30, SpaceType.Cos,
      corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
    .select(col("qid"), col("vec_id"), (lit(1.0) - col("distance")).as("rel"))
    .join(emb, "vec_id")
    .cache()

  private def run(lambda: Double, k: Int = 10) =
    Mmr.rerank(cands, k, lambda, queryId = "qid", corpusId = "vec_id",
        vecCol = "embedding", relCol = "rel")
      .select("qid", "vec_id", "step").as[(Long, Long, Long)].collect()

  test("λ=1 reduces to plain relevance order (no diversity penalty)") {
    val got = run(1.0).map { case (q, id, s) => (q, s) -> id }.toMap
    val plain = cands.select(col("qid"), col("vec_id"), col("rel"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).toSeq.flatMap { case (q, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(10).zipWithIndex.map {
          case (r, i) => (q, (i + 1).toLong) -> r._2 }.toSeq
      }.toMap
    assert(got === plain, "λ=1 MMR must equal descending-relevance top-k")
  }

  test("structural invariants: k rows per query, subset of candidates, steps 1..k") {
    val got = run(0.5)
    val byQ = got.groupBy(_._1)
    val candSet = cands.select(col("qid"), col("vec_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 10)
      assert(rs.map(_._3).sorted.toSeq === (1L to 10L), s"steps broken for $q")
      assert(rs.map(_._2).toSet.subsetOf(candSet(q)), s"non-candidate picked for $q")
      assert(rs.map(_._2).distinct.length === 10, s"duplicate pick for $q")
    }
  }

  test("diversity: exact-duplicate candidates are never picked consecutively ahead of distinct ones") {
    // 1 query; candidates = 3 copies of vector A (best relevance) + distinct
    // others. Plain top-k takes all copies first; MMR at λ=0.5 must
    // interleave — after one copy of A, its clones score rel/2 - sim/2 =
    // (1 - 1)/2 < any distinct candidate with sim < rel.
    val a = Seq(1f, 0f, 0f, 0f)
    val rows = Seq(
      (1L, 10L, 0.99, a), (1L, 11L, 0.99, a), (1L, 12L, 0.99, a),
      (1L, 20L, 0.90, Seq(0.8f, 0.6f, 0f, 0f)),
      (1L, 21L, 0.85, Seq(0f, 0f, 1f, 0f)),
      (1L, 22L, 0.80, Seq(0f, 0f, 0f, 1f)))
      .toDF("qid", "vec_id", "rel", "embedding")
    val got = Mmr.rerank(rows, 6, 0.5, queryId = "qid", corpusId = "vec_id",
        vecCol = "embedding", relCol = "rel")
      .orderBy("step").select("vec_id").as[Long].collect()
    assert(got.head === 10L, "first pick must be the most relevant")
    // all three distinct vectors are selected before the 2nd copy of A
    val firstCloneIdx = got.indexWhere(id => id == 11L || id == 12L)
    Seq(20L, 21L, 22L).foreach { d =>
      assert(got.indexOf(d) < firstCloneIdx,
        s"distinct candidate $d picked after a duplicate clone: ${got.toSeq}")
    }
  }

  test("deterministic across runs and repartitionings") {
    val r1 = run(0.5).sortBy(r => (r._1, r._3))
    val r2 = Mmr.rerank(cands.repartition(7), 10, 0.5, queryId = "qid",
        corpusId = "vec_id", vecCol = "embedding", relCol = "rel")
      .select("qid", "vec_id", "step").as[(Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._3))
    assert(r1.toSeq === r2.toSeq)
  }

  test("NaN relevances stop selection instead of crashing the task") {
    val rows = Seq(
      (1L, 1L, 0.9, Seq(1f, 0f)),
      (1L, 2L, Double.NaN, Seq(0f, 1f)),
      (1L, 3L, Double.NaN, Seq(0.5f, 0.5f)))
      .toDF("qid", "vec_id", "rel", "embedding")
    // step 1 picks the one finite-scored candidate; every remaining score
    // is NaN → selection stops with partial output, no AIOOBE
    val got = Mmr.rerank(rows, 3, 0.5, queryId = "qid", corpusId = "vec_id",
        vecCol = "embedding", relCol = "rel")
      .orderBy("step").select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(1L))
  }

  test("fewer candidates than k: selects all, steps stay dense") {
    val rows = Seq((1L, 1L, 0.9, Seq(1f, 0f)), (1L, 2L, 0.8, Seq(0f, 1f)))
      .toDF("qid", "vec_id", "rel", "embedding")
    val got = Mmr.rerank(rows, 10, 0.5, queryId = "qid", corpusId = "vec_id",
        vecCol = "embedding", relCol = "rel")
      .orderBy("step").select("vec_id", "step").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 1L), (2L, 2L)))
  }
}
