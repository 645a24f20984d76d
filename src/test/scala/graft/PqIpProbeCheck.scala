package graft

import org.apache.spark.sql.functions._
import graft.core.SpaceType
import graft.operators.{ExactKnn, IvfPq}

/** Empirical check for the assign-L2/probe-IP pairing: partial-nprobe IP
  * recall must degrade gracefully (like L2's own partial probing), not
  * collapse — ⟨q,x⟩ ≈ ⟨q,cent⟩ + ⟨q,residual⟩, and probing by ⟨q,cent⟩
  * targets exactly the lists maximizing the dominant term.
  */
class PqIpProbeCheck extends SparkSpec {
  import spark.implicits._

  test("ip recall at partial nprobe degrades gracefully, not collapses") {
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 300).map { i =>
      val scale = 1f + (i % 7)
      (i.toString, Seq.tabulate(16)(j =>
        scale * ((if (j % 10 == i % 10) 3f else 0.2f) + rnd.nextGaussian().toFloat * 0.2f)))
    }.toDF("id", "vector").cache()
    val queries = corpus.filter(col("id").cast("int") < 10)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val model = IvfPq.train(corpus, "vector", nlist = 5, m = 4, nbits = 6,
      space = graft.core.SpaceType.Ip)
    val encoded = IvfPq.encode(corpus, "vector", model).cache()
    val exact = ExactKnn.knn(corpus, queries, 10, SpaceType.Ip)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(np: Int): Double = {
      val approx = IvfPq.search(encoded, queries, model, kTop = 10, nprobe = np,
          rerankVecCol = Some("vector"))
        .select("query_id", "id").as[(String, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / exact.size
    }
    val r = Seq(1, 2, 3, 5).map(np => np -> recall(np))
    info(s"ip recall by nprobe: $r")
    assert(r.last._2 >= 0.9)
    assert(r(1)._2 >= 0.5, s"nprobe=2/5 ip recall collapsed: $r")
  }
}
