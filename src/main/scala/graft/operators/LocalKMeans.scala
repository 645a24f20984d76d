package graft.operators

import scala.collection.parallel.CollectionConverters._

/** Driver-local Lloyd k-means for bounded training samples.
  *
  * Quantizer training (IVF coarse centroids, PQ codebooks) always runs on a
  * capped sample; below a flops threshold a local multi-core Lloyd beats
  * MLlib by orders of magnitude — maxIter distributed rounds of scheduler
  * overhead vs microseconds per iteration. Semantics mirror the reference's
  * trainer (`internal/index/ivf.go:317-377`): deterministic first-k-distinct
  * init, fixed iteration count, empty clusters keep their previous centroid.
  */
object LocalKMeans {

  def fit(points: Array[Array[Double]], k: Int, maxIter: Int,
      tol: Double = 1e-9,
      warmStart: Option[Array[Array[Double]]] = None): Array[Array[Double]] = {
    require(points.nonEmpty, "empty training set")
    val dim = points(0).length
    val kEff = math.min(k, points.length)

    var centroids = warmStart match {
      // warm start (e.g. OPQ's alternation carries codebooks across
      // rotation updates — Lloyd from the previous solution keeps the outer
      // objective monotone where a fresh init could regress)
      case Some(ws) if ws.length == kEff => ws.map(_.clone())
      case _ =>
        // first-k-distinct init (deterministic, matches ivf.go first-k
        // semantics while avoiding degenerate duplicate centroids)
        val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
        var pi = 0
        while (init.length < kEff && pi < points.length) {
          val p = points(pi)
          if (seen.add(p.toSeq)) init += p.clone()
          pi += 1
        }
        // fewer distinct points than k: pad with repeats (harmless empty clusters)
        while (init.length < kEff) init += points(init.length % points.length).clone()
        init.toArray
    }

    var iter = 0
    while (iter < maxIter) {
      // parallel assignment (the O(n·k·d) part)
      val assign = points.par.map { p =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < kEff) {
          val ct = centroids(c)
          var s = 0.0; var i = 0
          while (i < dim) { val d = p(i) - ct(i); s += d * d; i += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        best
      }.toArray

      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      var n = 0
      while (n < points.length) {
        val c = assign(n); val p = points(n)
        val s = sums(c)
        var i = 0
        while (i < dim) { s(i) += p(i); i += 1 }
        counts(c) += 1
        n += 1
      }
      val next = Array.tabulate(kEff) { c =>
        if (counts(c) == 0) centroids(c) // empty cluster keeps old centroid (ivf.go:358-362)
        else sums(c).map(_ / counts(c))
      }
      // converged: max centroid movement² below tol → stop early (the
      // reference runs all 40 iterations; same fixpoint, fewer passes)
      var maxShift = 0.0
      var c = 0
      while (c < kEff) {
        var s = 0.0; var i = 0
        while (i < dim) { val d = next(c)(i) - centroids(c)(i); s += d * d; i += 1 }
        if (s > maxShift) maxShift = s
        c += 1
      }
      centroids = next
      iter = if (maxShift < tol) maxIter else iter + 1
    }
    centroids
  }
}
