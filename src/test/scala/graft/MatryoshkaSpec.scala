package graft

import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.operators.{ExactKnn, Matryoshka}

/** Matryoshka coarse-to-fine tier: recall vs exact KNN on prefix-informative
  * vectors, exact equivalence when the prefix is the whole vector, degraded
  * prefix honesty, and a UDF-free plan.
  */
class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  /** MRL-shaped corpus: the discriminative signal (cluster direction) lives
    * in the FIRST `sigDims` dims, the tail is i.i.d. noise — the structure
    * Matryoshka-trained embeddings have by construction.
    */
  private def mrlCorpus(n: Int, dim: Int, sigDims: Int) = {
    val rnd = new scala.util.Random(47)
    (0 until n).map { i =>
      val c = i % 8
      (i.toString, Seq.tabulate(dim) { j =>
        val sig = if (j < sigDims && j % 8 == c) 8f else 0f
        sig + rnd.nextGaussian().toFloat * 0.5f
      })
    }.toDF("id", "vector")
  }

  private def recall(got: Map[String, Set[String]], want: Map[String, Set[String]]): Double =
    want.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / want.size

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[String, Set[String]] =
    df.select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("prefix shortlist + full-dim re-rank: recall@10 >= 0.85; over-fetch knob is monotone") {
    val corpus = mrlCorpus(600, 64, sigDims = 16).cache()
    val queries = corpus.filter(col("id").cast("int") < 20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val exact = topSets(ExactKnn.knn(corpus, queries, 10, SpaceType.L2))
    def recallAt(factor: Int): Double = recall(topSets(
      Matryoshka.search(corpus, queries, prefixDim = 16, kTop = 10,
        space = SpaceType.L2, shortlistFactor = factor)), exact)
    val r4 = recallAt(4)
    val r16 = recallAt(16)
    assert(r4 >= 0.85, f"MRL recall@10 $r4%.3f < 0.85 at factor 4")
    assert(r16 >= r4, f"over-fetch recall not monotone: $r16%.3f < $r4%.3f")
    assert(r16 >= 0.95, f"MRL recall@10 $r16%.3f < 0.95 at factor 16")
  }

  test("prefixDim = full dim with factor covering the corpus ≡ exact KNN") {
    val corpus = mrlCorpus(200, 32, sigDims = 32).cache()
    val queries = corpus.filter(col("id").cast("int") < 10)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val exact = ExactKnn.knn(corpus, queries, 5, SpaceType.L2)
      .select("query_id", "id", "rnk").as[(String, String, Long)].collect().sorted
    val got = Matryoshka.search(corpus, queries, prefixDim = 32, kTop = 5,
        space = SpaceType.L2, shortlistFactor = 40)
      .select("query_id", "id", "rnk").as[(String, String, Long)].collect().sorted
    assert(got.toSeq === exact.toSeq,
      "full-prefix full-coverage MRL must equal exact KNN rank-for-rank")
  }

  test("an uninformative prefix degrades recall — the gate actually measures the funnel") {
    // signal lives in dims 32..63; a 8-dim prefix sees pure noise, so the
    // shortlist (40 of 400 candidates) cannot reliably contain the true
    // top-10 — guards against a recall gate that would pass trivially.
    val rnd = new scala.util.Random(53)
    val corpus = (0 until 400).map { i =>
      val c = i % 8
      (i.toString, Seq.tabulate(64) { j =>
        val sig = if (j >= 32 && j % 8 == c) 8f else 0f
        sig + rnd.nextGaussian().toFloat * 0.5f
      })
    }.toDF("id", "vector").cache()
    val queries = corpus.filter(col("id").cast("int") < 20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val exact = topSets(ExactKnn.knn(corpus, queries, 10, SpaceType.L2))
    val got = topSets(Matryoshka.search(corpus, queries, prefixDim = 8,
      kTop = 10, space = SpaceType.L2))
    val r = recall(got, exact)
    assert(r < 0.9, f"noise-prefix recall $r%.3f unexpectedly high — gate is vacuous")
  }

  test("energyShape on the real table: funnel recall >= 0.85 at factor 4, " +
      "clearly above the unshaped-penalty recall") {
    // the declared mrl_knn_shaped query's construction exactly: shaped twin
    // of the driver's embeddings table (tau = 16, the query's constant),
    // prefix 16 of 64, shortlist factor 4. The unshaped funnel on the same
    // table documents the penalty the shaping is supposed to remove — the
    // gate fails if shaping stops buying recall (e.g. a broken reweighting
    // that scales all dims equally would make both recalls match).
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"), col("embedding"))
    val shaped = emb.select(col("id"),
      Matryoshka.energyShape(col("embedding"), Matryoshka.DefaultShapeTau).as("vector")).cache()
    val raw = emb.select(col("id"), col("embedding").as("vector")).cache()
    def funnelRecall(corpus: org.apache.spark.sql.DataFrame): Double = {
      val queries = corpus.filter(col("id").cast("int") < 20)
        .select(col("id").as("query_id"), col("vector").as("query_vec"))
      val exact = topSets(ExactKnn.knn(corpus, queries, 10, SpaceType.L2))
      recall(topSets(Matryoshka.search(corpus, queries, prefixDim = 16,
        kTop = 10, space = SpaceType.L2, shortlistFactor = 4)), exact)
    }
    val rShaped = funnelRecall(shaped)
    val rRaw = funnelRecall(raw)
    info(f"shaped recall@10 = $rShaped%.3f, unshaped = $rRaw%.3f")
    assert(rShaped >= 0.85, f"shaped-table funnel recall $rShaped%.3f < 0.85")
    assert(rShaped >= rRaw + 0.10,
      f"shaping buys no recall: shaped $rShaped%.3f vs unshaped $rRaw%.3f")
    shaped.unpersist(); raw.unpersist()
  }

  test("search plan is UDF-free codegen") {
    val corpus = mrlCorpus(100, 16, sigDims = 8)
    val queries = corpus.limit(3)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val plan = Matryoshka.search(corpus, queries, prefixDim = 8, kTop = 3,
      space = SpaceType.L2).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf") && !plan.contains("BatchEvalPython"),
      "MRL search plan contains a UDF node")
  }
}
