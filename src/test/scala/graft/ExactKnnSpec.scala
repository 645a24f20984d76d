package graft

import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.operators.ExactKnn

/** ExactKnn (Flat parity) vs an in-test brute-force oracle — mirrors the
  * reference's `flat_test.go:22-48` corpus and the benchmark harness's
  * ground-truth computation (`benchmarks/run_benchmarks.py:126-133`).
  */
class ExactKnnSpec extends SparkSpec {
  import spark.implicits._

  /** FIXTURES F-2: 20 docs dim 4, vec_i = [i-1,0,0,0]; query [6,0,0,0], k=3
    * → top-1 id "7" (dist 0), then "6"/"8" (dist 1, tie broken by id).
    */
  test("flat-parity corpus: ids and squared-L2 distances match flat_test.go") {
    val corpus = (1 to 20).map(i => (i.toString, Seq((i - 1).toFloat, 0f, 0f, 0f)))
      .toDF("id", "vector")
    val queries = Seq(("q0", Seq(6f, 0f, 0f, 0f))).toDF("query_id", "query_vec")
    val got = ExactKnn.knn(corpus, queries, 3, SpaceType.L2)
      .orderBy("rnk")
      .select("id", "distance")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("7", 0.0), ("6", 1.0), ("8", 1.0)))
  }

  test("batch knn matches brute-force oracle on sf0.001 embeddings") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val data = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val queries = data.filter(_._1 < 5)
    val got = ExactKnn.knn(
        emb.select(col("vec_id"), col("embedding")),
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec")),
        k = 10, SpaceType.L2, corpusId = "vec_id", corpusVec = "embedding")
      .select("query_id", "vec_id", "rnk")
      .as[(Long, Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (q, hits) => q -> hits.sortBy(_._3).map(_._2).toSeq }

    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    queries.foreach { case (qid, qv) =>
      val expect = data.map { case (id, v) => (id, l2sq(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSeq
      assert(got(qid) === expect, s"query $qid")
    }
  }

  test("radius search returns exactly the rows within the bound") {
    val corpus = (1 to 20).map(i => (i.toString, Seq((i - 1).toFloat, 0f, 0f, 0f)))
      .toDF("id", "vector")
    val queries = Seq(("q0", Seq(6f, 0f, 0f, 0f))).toDF("query_id", "query_vec")
    val got = ExactKnn.radius(corpus, queries, 4.0, SpaceType.L2)
      .select("id").as[String].collect().sorted
    assert(got.toSeq === Seq("5", "6", "7", "8", "9")) // dists 4,1,0,1,4
  }

  test("label agreement flags the planted mislabel, self never counted") {
    import graft.queries.VectorQueries
    // planted geometry on the real table shape: two tight clusters, one
    // point carrying the WRONG cluster's label — its neighborhood agreement
    // must collapse while every clean point stays unanimous
    val dir = java.nio.file.Files.createTempDirectory("label-agree").toString
    val rows = (0 until 30).map { i =>
      val cl = i % 2
      val base = if (cl == 0) 0f else 100f
      val label = if (i == 4) 1 else cl // vec 4 sits in cluster 0, labeled 1
      (i.toLong, Seq(base + (i / 2) * 0.01f, base, 0f, 0f), label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorQueries.labelAgreement(spark, dir)
      .select("vec_id", "agree", "suspect")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size === 30)
    assert(got(4L) === ((0L, 1L)), s"planted mislabel not flagged: ${got(4L)}")
    // clean cluster-0 points: 10 nearest non-self neighbors are cluster 0,
    // one of which (vec 4) wears the wrong label → agree = 9, not suspect
    for ((id, (agree, suspect)) <- got if id != 4L) {
      assert(agree >= 9L && suspect === 0L,
        s"clean point $id misjudged: agree=$agree suspect=$suspect")
    }
  }

  test("knn plan: corpus side has no pre-topk shuffle; window group-limit kicks in") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = ExactKnn.knn(
      emb.select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec")),
      k = 10, SpaceType.L2, corpusId = "vec_id", corpusVec = "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected broadcast join in:\n$plan")
  }
}
