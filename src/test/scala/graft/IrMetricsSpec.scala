package graft

import org.apache.spark.sql.functions._

/** ir_metrics vs a brute-force recount: exact self-excluded top-k by
  * (l2, id), label-derived relevance, and the three single-division metrics.
  */
class IrMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("ir_metrics matches a brute-force recount on sf0.001 embeddings") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
      .map { case (id, v, l) => (id, v.toArray, l) }
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    val labelOf = emb.map(e => e._1 -> e._3).toMap
    val nLabel = emb.groupBy(_._3).view.mapValues(_.length).toMap
    val K = 10
    val expect = emb.filter(_._1 < 10).map { case (qid, qv, qlab) =>
      val top = emb.filter(_._1 != qid)
        .map(e => (e._1, l2(qv, e._2)))
        .sortBy { case (id, d) => (d, id) }.take(K)
      val rels = top.zipWithIndex
        .filter { case ((id, _), _) => labelOf(id) == qlab }
      val relInK = rels.length.toLong
      val firstRel = rels.headOption.map(_._2 + 1)
      val nRel = nLabel(qlab) - 1
      (qid, relInK, relInK.toDouble / K,
        if (nRel == 0) 0.0 else relInK.toDouble / nRel,
        firstRel.map(1.0 / _).getOrElse(0.0))
    }.toSet

    val got = graft.queries.VectorQueries.queries("ir_metrics")(spark, sf0001)
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    assert(got === expect)
    // metrics are non-vacuous on this corpus: some query finds a same-label
    // neighbor in its top-k
    assert(got.exists(_._2 > 0L), "no relevant hits anywhere — data vacuous")
  }
}
