package graft

import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.operators.{ExactKnn, ScalarQuant}

/** SQ8 tier: code width, quantization error bound, recall vs exact KNN,
  * UDF-free plan.
  */
class ScalarQuantSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(31)
    (0 until n).map { i =>
      val c = i % 10
      (i.toString, Seq.tabulate(dim)(j =>
        (if (j % 10 == c) 10f else 0f) + rnd.nextGaussian().toFloat * 0.3f))
    }.toDF("id", "vector")
  }

  test("codes are exactly 1 byte/dim; dequantization error <= half a quantization step") {
    val corpus = clustered(200, 16).cache()
    val model = ScalarQuant.train(corpus, "vector")
    val rows = ScalarQuant.encode(corpus, "vector", model)
      .select(col("vector"), col("sq_code")).collect()
    val inv = model.invScales
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]](0)
      val code = r.getAs[Array[Byte]](1)
      assert(code.length === 16, s"code width ${code.length} != dim")
      (0 until 16).foreach { i =>
        val deq = model.mins(i) + (code(i) & 0xFF).toDouble * inv(i)
        // half a step + float slack; exact at the clamped range edges too
        assert(math.abs(deq - v(i)) <= inv(i) * 0.5 + 1e-5,
          s"dim $i: dequantized $deq vs ${v(i)} exceeds half-step ${inv(i) * 0.5}")
      }
    }
  }

  test("SQ8 + exact re-rank: recall@10 >= 0.95; ADC-only >= 0.9 (near-exact tier)") {
    val corpus = clustered(500, 32).cache()
    val queries = corpus.filter(col("id").cast("int") < 20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val model = ScalarQuant.train(corpus, "vector")
    val encoded = ScalarQuant.encode(corpus, "vector", model).cache()
    val exact = ExactKnn.knn(corpus, queries, 10, SpaceType.L2)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(rerank: Boolean): Double = {
      val got = ScalarQuant.search(encoded, queries, model, kTop = 10,
          rerankVecCol = if (rerank) Some("vector") else None)
        .select("query_id", "id").as[(String, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / exact.size
    }
    val adc = recallOf(rerank = false)
    val rr = recallOf(rerank = true)
    assert(adc >= 0.9, f"SQ8 ADC-only recall $adc%.3f < 0.9")
    assert(rr >= 0.95, f"SQ8 re-ranked recall $rr%.3f < 0.95")
  }

  test("search plan is UDF-free codegen") {
    val corpus = clustered(100, 16)
    val model = ScalarQuant.train(corpus, "vector")
    val encoded = ScalarQuant.encode(corpus, "vector", model)
    val queries = corpus.limit(3)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val plan = ScalarQuant.search(encoded, queries, model, kTop = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf") && !plan.contains("BatchEvalPython"),
      "SQ search plan contains a UDF node")
  }
}
