package graft

import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.operators.IvfPq

/** The distributed PQ query path (executor-side ADC tables via the codegen
  * `PqAdcTable` kernel, no driver table loop) must produce IDENTICAL results
  * to the driver-table path — same probe lists, bit-identical tables, same
  * (distance, id) tie-breaks — for every supported space, with and without
  * exact re-rank. Plus: a query set far beyond sane collect() sizes plans and
  * runs, and the plan is UDF-free.
  */
class IvfPqDistributedSpec extends SparkSpec {
  import spark.implicits._

  private def corpusFor(space: SpaceType) = {
    // varied magnitudes so ip/cos rankings genuinely differ from l2
    val rnd = new scala.util.Random(space.name.hashCode)
    (0 until 300).map { i =>
      val scale = 1f + (i % 7)
      (i.toString, Seq.tabulate(16)(j =>
        scale * ((if (j % 10 == i % 10) 3f else 0.2f) + rnd.nextGaussian().toFloat * 0.2f)))
    }.toDF("id", "vector")
  }

  test("searchDistributed ≡ search for l2, ip, cos — with and without re-rank") {
    for (space <- Seq(SpaceType.L2, SpaceType.Ip, SpaceType.Cos)) {
      val corpus = corpusFor(space).cache()
      val queries = corpus.filter(col("id").cast("int") < 20)
        .select(col("id").as("query_id"), col("vector").as("query_vec"))
      val model = IvfPq.train(corpus, "vector", nlist = 5, m = 4, nbits = 6, space = space)
      val encoded = IvfPq.encode(corpus, "vector", model).cache()
      for (rerank <- Seq(None, Some("vector"))) {
        val a = IvfPq.search(encoded, queries, model, kTop = 10, nprobe = 3,
            rerankVecCol = rerank)
          .select("query_id", "id", "rnk").as[(String, String, Long)].collect().toSet
        val b = IvfPq.searchDistributed(encoded, queries, model, kTop = 10, nprobe = 3,
            rerankVecCol = rerank)
          .select("query_id", "id", "rnk").as[(String, String, Long)].collect().toSet
        assert(a === b,
          s"distributed PQ path diverged from driver-table path for ${space.name}, rerank=$rerank")
      }
      // distances agree too (not just ids): the ADC tables are bit-identical
      val da = IvfPq.search(encoded, queries, model, kTop = 10, nprobe = 3)
        .select("query_id", "id", "distance").as[(String, String, Double)].collect().toMap2
      val db = IvfPq.searchDistributed(encoded, queries, model, kTop = 10, nprobe = 3)
        .select("query_id", "id", "distance").as[(String, String, Double)].collect().toMap2
      assert(da === db, s"ADC distances diverged for ${space.name}")
      encoded.unpersist(); corpus.unpersist()
    }
  }

  private implicit class Pairs(rows: Array[(String, String, Double)]) {
    def toMap2: Map[(String, String), Double] =
      rows.map { case (q, i, d) => ((q, i), d) }.toMap
  }

  test("large query set (5k) runs collect-free; plan has no UDF nodes") {
    val corpus = corpusFor(SpaceType.L2).cache()
    val model = IvfPq.train(corpus, "vector", nlist = 5, m = 4, nbits = 6)
    val encoded = IvfPq.encode(corpus, "vector", model).cache()
    val bigQ = spark.range(5000).select(col("id").cast("string").as("query_id"),
      array((0 until 16).map(j => (rand(j) * 5).cast("float")): _*).as("query_vec"))
    val res = IvfPq.searchDistributed(encoded, bigQ, model, kTop = 3, nprobe = 2)
    // the plan must be pure codegen kernels — no UDF/serialization boundary
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      "distributed PQ plan contains a UDF node")
    assert(res.groupBy("query_id").count().count() === 5000L)
    encoded.unpersist(); corpus.unpersist()
  }

  test("dimension-mismatched query errors (P3 guard reaches the ADC kernel)") {
    val corpus = corpusFor(SpaceType.L2)
    val model = IvfPq.train(corpus, "vector", nlist = 3, m = 4, nbits = 4)
    val encoded = IvfPq.encode(corpus, "vector", model)
    val badQ = Seq(("q", Seq(1f, 2f, 3f, 4f))).toDF("query_id", "query_vec")
    val ex = intercept[Exception] {
      IvfPq.searchDistributed(encoded, badQ, model, kTop = 3, nprobe = 2).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(ex).exists(_.contains("dimension")),
      s"expected a dimension error, got: ${ex.getMessage}")
  }
}
