package graft

import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.operators.{ExactKnn, IvfPq, Opq}

/** OPQ pre-rotation: orthonormality, decreasing training objective, recall
  * advantage over plain PQ at EQUAL code budget on correlated data, and
  * distributed ≡ driver parity through the rotated path.
  */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  /** Low-rank fixture: an 8-cluster mixture living in a 4-d latent subspace,
    * mixed into 16 coordinates by a fixed dense matrix. Every coordinate
    * block sees a full-variance marginal with cross-block correlation it
    * cannot exploit — the regime OPQ exists for (a learned rotation can
    * re-concentrate the intrinsic directions into balanced subspaces).
    * Deterministic.
    */
  private def correlated(n: Int) = {
    val rnd = new scala.util.Random(97)
    val dim = 16; val latent = 4
    val mix = Array.fill(dim, latent)(rnd.nextGaussian())
    (0 until n).map { i =>
      val c = i % 8
      val z = Array.tabulate(latent) { l =>
        (if (l == c % latent) 4.0 else 0.0) +
          (if (c >= 4 && l == (c + 1) % latent) 3.0 else 0.0) +
          rnd.nextGaussian() * 0.4
      }
      val x = Array.tabulate(dim)(j =>
        (0 until latent).map(l => mix(j)(l) * z(l)).sum.toFloat)
      (i.toString, x.toSeq)
    }.toDF("id", "vector")
  }

  private def recallOf(approx: Map[String, Set[String]], exact: Map[String, Set[String]]): Double =
    exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / exact.size

  test("rotation is orthonormal; OPQ objective is non-increasing") {
    val corpus = correlated(400).cache()
    val model = Opq.train(corpus, "vector", nlist = 4, m = 4, nbits = 4, opqIters = 8)
    val d = model.dim
    // R·Rᵀ ≈ I
    for (r <- 0 until d; c <- 0 until d) {
      val dot = (0 until d).map(i => model.rotation(r)(i).toDouble * model.rotation(c)(i)).sum
      val want = if (r == c) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-4, s"R·Rᵀ[$r][$c] = $dot, want $want")
    }
    val errs = model.trainErrors
    assert(errs.length === 8)
    errs.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a * 1.0001, s"OPQ objective rose: ${errs.mkString(", ")}")
    }
    assert(errs.last < errs.head, "OPQ objective did not improve at all")
  }

  test("OPQ beats plain PQ at equal code budget on correlated data (ADC-only recall)") {
    val corpus = correlated(600).cache()
    val queries = corpus.filter(col("id").cast("int") < 30)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val exact = ExactKnn.knn(corpus, queries, 10, SpaceType.L2)
      .select("query_id", "id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def adcRecall(useOpq: Boolean): Double = {
      val got = if (useOpq) {
        val m = Opq.train(corpus, "vector", nlist = 4, m = 4, nbits = 4, opqIters = 8)
        Opq.search(Opq.encode(corpus, "vector", m).cache(), queries, m,
          kTop = 10, nprobe = 4, rerank = false)
      } else {
        val m = IvfPq.train(corpus, "vector", nlist = 4, m = 4, nbits = 4)
        IvfPq.search(IvfPq.encode(corpus, "vector", m).cache(), queries, m,
          kTop = 10, nprobe = 4)
      }
      recallOf(got.select("query_id", "id").as[(String, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap, exact)
    }
    val pq = adcRecall(useOpq = false)
    val opq = adcRecall(useOpq = true)
    assert(opq > pq,
      f"OPQ recall $opq%.3f not above plain PQ $pq%.3f at equal budget (m=4, nbits=4)")
  }

  test("Opq.searchDistributed ≡ Opq.search; re-ranked distances are original-space exact") {
    val corpus = correlated(400).cache()
    val queries = corpus.filter(col("id").cast("int") < 15)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val model = Opq.train(corpus, "vector", nlist = 4, m = 4, nbits = 4, opqIters = 5)
    val encoded = Opq.encode(corpus, "vector", model).cache()
    val a = Opq.search(encoded, queries, model, kTop = 5, nprobe = 4)
      .select("query_id", "id", "rnk").as[(String, String, Long)].collect().toSet
    val b = Opq.searchDistributed(encoded, queries, model, kTop = 5, nprobe = 4)
      .select("query_id", "id", "rnk").as[(String, String, Long)].collect().toSet
    assert(a === b, "distributed OPQ path diverged from driver path")
    // re-rank runs in ORIGINAL space: distances are bit-identical to exact KNN
    val exactD = ExactKnn.knn(corpus, queries, 5, SpaceType.L2)
      .select("query_id", "id", "distance").as[(String, String, Double)].collect()
      .map { case (q, i, d) => ((q, i), d) }.toMap
    val gotD = Opq.search(encoded, queries, model, kTop = 5, nprobe = 4)
      .select("query_id", "id", "distance").as[(String, String, Double)].collect()
    gotD.foreach { case (q, i, d) =>
      exactD.get((q, i)).foreach { ed =>
        assert(d === ed, s"re-ranked distance $d != original-space exact $ed for ($q,$i)")
      }
    }
  }

  test("full-covariance rotation (treeAggregate) ≈ sample rotation when the sample IS the corpus") {
    val corpus = correlated(400).cache()
    // rotationSampleCap ≥ n ⇒ both paths train codebooks on the same rows;
    // the distributed path aggregates B over the same set, so the learned
    // rotations must agree up to summation-order float noise
    val local = Opq.train(corpus, "vector", nlist = 4, m = 4, nbits = 4,
      opqIters = 5)
    val dist = Opq.train(corpus, "vector", nlist = 4, m = 4, nbits = 4,
      opqIters = 5, rotationFullCovariance = true)
    // the two paths optimize the same objective over the same rows, so the
    // per-iteration objective sequences must agree to summation-order noise.
    // (The rotation MATRICES need not match element-wise: the fixture's
    // residuals are rank-deficient, so the Procrustes SVD has near-zero
    // singular directions where any orthonormal completion is optimal —
    // equal objectives with different R is the expected degeneracy, and the
    // orthonormality test above covers validity.)
    local.trainErrors.zip(dist.trainErrors).foreach { case (a, b) =>
      assert(math.abs(a - b) / math.max(a, 1e-12) < 1e-6, s"objective diverged: $a vs $b")
    }
    val d = dist.dim
    for (r <- 0 until d; c <- 0 until d) {
      val dot = (0 until d).map(i => dist.rotation(r)(i).toDouble * dist.rotation(c)(i)).sum
      assert(math.abs(dot - (if (r == c) 1.0 else 0.0)) < 1e-4)
    }
    dist.trainErrors.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a * 1.0001, "distributed OPQ objective rose")
    }
    // end-to-end: the distributed-rotation model searches correctly
    val queries = corpus.filter(col("id").cast("int") < 10)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val enc = Opq.encode(corpus, "vector", dist)
    val res = Opq.search(enc, queries, dist, kTop = 5, nprobe = 4)
    assert(res.groupBy("query_id").count().count() === 10L)
  }

  test("full-covariance rotation handles the cos space (normalized residual frame)") {
    val corpus = correlated(300).cache()
    val model = Opq.train(corpus, "vector", nlist = 4, m = 4, nbits = 4,
      opqIters = 3, space = SpaceType.Cos, rotationFullCovariance = true)
    val d = model.dim
    for (r <- 0 until d; c <- 0 until d) {
      val dot = (0 until d).map(i => model.rotation(r)(i).toDouble * model.rotation(c)(i)).sum
      assert(math.abs(dot - (if (r == c) 1.0 else 0.0)) < 1e-4)
    }
    val queries = corpus.filter(col("id").cast("int") < 5)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val enc = Opq.encode(corpus, "vector", model)
    val res = Opq.search(enc, queries, model, kTop = 3, nprobe = 4)
    assert(res.groupBy("query_id").count().count() === 5L)
  }
}
