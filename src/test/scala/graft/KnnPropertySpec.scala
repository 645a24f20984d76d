package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.SpaceType
import graft.operators.ExactKnn

/** Property: for arbitrary random corpora, both KNN plans (window and
  * aggregate) equal a local brute-force oracle — ids AND distances
  * (double accumulation over float32 inputs, so equality is exact).
  */
class KnnPropertySpec extends SparkSpec {
  import spark.implicits._

  private def l2sq(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  test("knn and knnAgg equal local brute force on random corpora") {
    val genCase = for {
      dim <- Gen.choose(1, 6)
      n <- Gen.choose(5, 40)
      k <- Gen.choose(1, 8)
      vals <- Gen.listOfN(n * dim, Gen.choose(-8, 8).map(_.toFloat / 2f))
    } yield (dim, n, k, vals)

    (0 until 8).foreach { trial =>
      val (dim, n, k, vals) =
        genCase.apply(Gen.Parameters.default, Seed(1000L + trial)).get
      val corpus = (0 until n).map(i =>
        (i.toString, vals.slice(i * dim, (i + 1) * dim)))
      val corpusDf = corpus.toDF("id", "vector")
      val queries = corpus.take(3).map { case (id, v) => (s"q$id", v) }
      val queriesDf = queries.toDF("query_id", "query_vec")

      val expected = queries.map { case (qid, qv) =>
        qid -> corpus.map { case (id, v) => (id, l2sq(qv, v)) }
          .sortBy { case (id, d) => (d, id) }.take(k)
      }.toMap

      for (impl <- Seq("window", "agg")) {
        val fn = if (impl == "window") ExactKnn.knn _ else ExactKnn.knnAgg _
        val got = fn(corpusDf, queriesDf, k, SpaceType.L2, "id", "vector", "query_id", "query_vec")
          .select("query_id", "id", "distance", "rnk")
          .as[(String, String, Double, Long)].collect()
          .groupBy(_._1).view
          .mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
        expected.foreach { case (qid, want) =>
          assert(got(qid) === want.toSeq, s"trial $trial impl $impl query $qid dim=$dim n=$n k=$k")
        }
      }
    }
  }
}
