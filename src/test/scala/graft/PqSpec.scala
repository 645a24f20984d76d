package graft

import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.operators.{ExactKnn, IvfPq}

/** IVFPQ vs FIXTURES F-6: param validation (dim % m), recall ≥ 0.9 on
  * clustered data, and quantization sanity (enough codes → near-exact).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val c = i % 10
      val v = Array.tabulate(dim)(j =>
        (if (j % 10 == c) 10f else 0f) + rnd.nextGaussian().toFloat * 0.3f)
      (i.toString, v.toSeq)
    }.toDF("id", "vector")
  }

  test("dimension not divisible by m errors (ivfpq_test.go parity)") {
    val corpus = clustered(50, 10)
    intercept[IllegalArgumentException](
      IvfPq.train(corpus, "vector", nlist = 2, m = 3))
    intercept[IllegalArgumentException](
      IvfPq.train(corpus, "vector", nlist = 2, m = 2, nbits = 9))
  }

  test("recall@10 >= 0.9 on clustered data (nlist=5, m=4, full probe)") {
    val corpus = clustered(300, 16).cache()
    val queries = corpus.filter(col("id").cast("int") < 10)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val model = IvfPq.train(corpus, "vector", nlist = 5, m = 4, nbits = 6)
    val encoded = IvfPq.encode(corpus, "vector", model).cache()

    def recallOf(rerank: Boolean): Double = {
      val approx = IvfPq.search(encoded, queries, model, kTop = 10, nprobe = 5,
          rerankVecCol = if (rerank) Some("vector") else None)
        .select("query_id", "id").as[(String, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = ExactKnn.knn(corpus, queries, 10, SpaceType.L2)
        .select("query_id", "id").as[(String, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      recalls.sum / recalls.size
    }
    val adcOnly = recallOf(rerank = false)
    val reranked = recallOf(rerank = true)
    assert(reranked >= 0.9, f"re-ranked recall@10 $reranked%.3f < 0.9 (ADC-only was $adcOnly%.3f)")
    assert(reranked >= adcOnly, "re-rank must not reduce recall")
  }

  test("ip space: ADC(ip)+rerank matches exact inner-product KNN (recall >= 0.9)") {
    // un-normalized vectors so ip and l2 rankings genuinely differ
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

    val approx = IvfPq.search(encoded, queries, model, kTop = 10, nprobe = 5,
        rerankVecCol = Some("vector"))
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = ExactKnn.knn(corpus, queries, 10, SpaceType.Ip)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, f"ip recall@10 $mean%.3f < 0.9")
    // the ip results must NOT be the l2 results (the metric genuinely differs)
    val l2 = ExactKnn.knn(corpus, queries, 10, SpaceType.L2)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(exact != l2, "fixture degenerate: ip and l2 rankings coincide")
  }

  test("cos space: normalized-residual ADC+rerank matches exact cosine KNN (recall >= 0.9)") {
    // varied magnitudes so cos and l2 rankings genuinely differ
    val rnd = new scala.util.Random(13)
    val corpus = (0 until 300).map { i =>
      val scale = 1f + (i % 9)
      (i.toString, Seq.tabulate(16)(j =>
        scale * ((if (j % 10 == i % 10) 3f else 0.2f) + rnd.nextGaussian().toFloat * 0.2f)))
    }.toDF("id", "vector").cache()
    val queries = corpus.filter(col("id").cast("int") < 10)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val model = IvfPq.train(corpus, "vector", nlist = 5, m = 4, nbits = 6,
      space = graft.core.SpaceType.Cos)
    val encoded = IvfPq.encode(corpus, "vector", model).cache()

    val approx = IvfPq.search(encoded, queries, model, kTop = 10, nprobe = 5,
        rerankVecCol = Some("vector"))
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = ExactKnn.knn(corpus, queries, 10, SpaceType.Cos)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, f"cos recall@10 $mean%.3f < 0.9")
    // the cos results must NOT be the l2 results (the metric genuinely differs)
    val l2 = ExactKnn.knn(corpus, queries, 10, SpaceType.L2)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(exact != l2, "fixture degenerate: cos and l2 rankings coincide")
    // ADC-only distances approximate the true cosine distance scale [0,2]
    val adcDists = IvfPq.search(encoded, queries, model, kTop = 10, nprobe = 5)
      .select("distance").as[Double].collect()
    assert(adcDists.forall(d => d >= -0.1 && d <= 2.1),
      s"ADC cos distances outside [0,2]: ${adcDists.min} .. ${adcDists.max}")
  }

  test("hamming space rejected for ivfpq (no silent metric fallback)") {
    val corpus = clustered(50, 8)
    intercept[IllegalArgumentException](
      IvfPq.train(corpus, "vector", nlist = 2, m = 2, space = graft.core.SpaceType.Hamming))
  }

  test("encoded corpus carries m small codes; codes within codebook range") {
    val corpus = clustered(100, 8)
    val model = IvfPq.train(corpus, "vector", nlist = 2, m = 2, nbits = 4)
    val codes = IvfPq.encode(corpus, "vector", model)
      .select("codes").as[Seq[Int]].collect()
    assert(codes.forall(_.length == 2))
    assert(codes.flatten.forall(c => c >= 0 && c < model.k))
  }
}
