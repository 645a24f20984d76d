package graft

import org.apache.spark.sql.functions._

import graft.operators.LateInteraction

/** MaxSim late-interaction retrieval vs an in-test brute-force recount that
  * replays the operator's exact float contract: in-order float→double dot,
  * exact per-token max, fixed-order (tok 0..T-1) chain of adds.
  */
class LateInteractionSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  test("maxsim_knn matches a brute-force recount on sf0.001 embeddings") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.toArray) }.sortBy(_._1)
    val docs = emb.groupBy(_._1 / 4).view
      .mapValues(_.sortBy(_._1).map(_._2)).toMap
    val queries = emb.filter(_._1 < 40).groupBy(_._1 / 4).view
      .mapValues(_.sortBy(_._1).map(_._2)).toMap
    val expect = queries.flatMap { case (qid, qtoks) =>
      val scored = docs.toSeq.map { case (did, dtoks) =>
        // fixed-order adds over tok 0..3, matching the operator's chain
        val s = qtoks.map(qt => dtoks.map(dt => dot(qt, dt)).max)
          .foldLeft(0.0)(_ + _)
        (did, s)
      }
      scored.sortBy { case (did, s) => (-s, did) }.take(10)
        .zipWithIndex.map { case ((did, _), i) => (qid, did, (i + 1).toLong) }
    }.toSet

    val got = graft.queries.VectorQueries.queries("maxsim_knn")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expect)
  }

  test("shortlisted maxsim: recall vs the exact top-k, and subset scoring identity") {
    val exact = graft.queries.VectorQueries.queries("maxsim_knn")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val short = graft.queries.VectorQueries.queries("maxsim_knn_ivf")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    // per-query rank lists must be dense 1..n permutations
    short.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq,
        s"query $qid: rnk not dense")
    }
    val recalls = exact.map { case (qid, t) =>
      val got = short.filter(_._1 == qid).map(_._2).toSet
      got.intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, f"mean shortlist recall@10 $mean%.2f below gate 0.7")
  }

  test("missing query tokens contribute zero, not null") {
    val ct = Seq((0L, Seq(1f, 0f)), (0L, Seq(0f, 1f)), (1L, Seq(-1f, 0f)))
      .toDF("doc_id", "dv")
    // query 7 has tokens 0 and 2 only (token 1 absent)
    val qt = Seq((7L, 0L, Seq(1f, 0f)), (7L, 2L, Seq(0f, 1f)))
      .toDF("qid", "tok", "qv")
    val got = LateInteraction.maxSim(ct, qt, k = 2, nTokens = 4)
      .as[(Long, Long, Long)].collect().toSet
    // doc 0: max⟨t0,·⟩ = 1, max⟨t2,·⟩ = 1, absent tokens → 0 ⇒ score 2;
    // doc 1 (one token (-1,0)): max⟨t0,·⟩ = -1, max⟨t2,·⟩ = 0 ⇒ score -1.
    // Both docs ranked — a null-propagating score would have killed every
    // group (tokens 1 and 3 have no rows anywhere).
    assert(got === Set((7L, 0L, 1L), (7L, 1L, 2L)))
  }
}
