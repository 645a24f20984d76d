package graft

import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.operators.{BinaryQuant, ExactKnn}

/** BQ 1-bit tier: code width + bit semantics, recall vs exact KNN with the
  * over-fetch re-rank, determinism of the shortlist, UDF-free plan.
  */
class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(47)
    (0 until n).map { i =>
      val c = i % 10
      (i.toString, Seq.tabulate(dim)(j =>
        (if (j % 10 == c) 10f else 0f) + rnd.nextGaussian().toFloat * 0.3f))
    }.toDF("id", "vector")
  }

  test("codes are exactly ceil(dim/8) bytes; bit i == (v[i] > threshold[i])") {
    val corpus = clustered(200, 20).cache() // 20 dims -> 3 bytes, 4 pad bits
    val model = BinaryQuant.train(corpus, "vector")
    assert(model.dim === 20)
    assert(model.codeBytes === 3)
    val rows = BinaryQuant.encode(corpus, "vector", model)
      .select(col("vector"), col("bq_code")).collect()
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]](0)
      val code = r.getAs[Array[Byte]](1)
      assert(code.length === 3, s"code width ${code.length} != ceil(20/8)")
      (0 until 20).foreach { i =>
        val bit = (code(i >> 3) >> (i & 7)) & 1
        val want = if (v(i) > model.thresholds(i)) 1 else 0
        assert(bit === want, s"dim $i: bit $bit, v=${v(i)} thr=${model.thresholds(i)}")
      }
      // pad bits above dim stay zero (stable codes -> stable hamming)
      (20 until 24).foreach { i =>
        assert(((code(i >> 3) >> (i & 7)) & 1) === 0, s"pad bit $i set")
      }
    }
  }

  test("train is order-independent: same model at 1 and 13 partitions; empty corpus -> empty model") {
    val corpus = clustered(300, 16)
    val m1 = BinaryQuant.train(corpus.repartition(1), "vector")
    val m13 = BinaryQuant.train(corpus.repartition(13), "vector")
    assert(m1.thresholds.toSeq === m13.thresholds.toSeq)
    val empty = BinaryQuant.train(corpus.filter(col("id") === "none"), "vector")
    assert(empty.dim === 0)
  }

  test("BQ + exact re-rank (8x over-fetch): recall@10 >= 0.9 on clustered data") {
    val corpus = clustered(500, 32).cache()
    val queries = corpus.filter(col("id").cast("int") < 20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val model = BinaryQuant.train(corpus, "vector")
    val encoded = BinaryQuant.encode(corpus, "vector", model).cache()
    val exact = ExactKnn.knn(corpus, queries, 10, SpaceType.L2)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = BinaryQuant.search(encoded, queries, model, kTop = 10,
        rerankVecCol = Some("vector"), rerankFactor = 8)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / exact.size
    assert(recall >= 0.9, f"BQ re-ranked recall $recall%.3f < 0.9")
  }

  test("shortlist is deterministic across runs and partitionings (hamming ties break by id)") {
    val corpus = clustered(400, 24)
    val queries = corpus.filter(col("id").cast("int") < 5)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val model = BinaryQuant.train(corpus, "vector")
    def shortlist(parts: Int): Seq[(String, String)] = {
      val enc = BinaryQuant.encode(corpus.repartition(parts), "vector", model)
      BinaryQuant.search(enc, queries, model, kTop = 40)
        .select("query_id", "id").as[(String, String)].collect().sorted.toSeq
    }
    assert(shortlist(3) === shortlist(11))
  }

  test("search plan is UDF-free codegen and broadcasts the query side") {
    val corpus = clustered(100, 16)
    val model = BinaryQuant.train(corpus, "vector")
    val encoded = BinaryQuant.encode(corpus, "vector", model)
    val queries = corpus.limit(3)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val plan = BinaryQuant.search(encoded, queries, model, kTop = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf") && !plan.contains("BatchEvalPython"),
      "BQ search plan contains a UDF node")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"BQ search should broadcast the tiny query side:\n$plan")
  }
}
