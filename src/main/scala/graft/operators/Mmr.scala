package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance (MMR) diversified re-ranking: from each
  * query's ANN candidate list, greedily select k results trading relevance
  * against redundancy —
  *
  *   score(c) = λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)
  *
  * (Carbonell & Goldstein 1998). The curation use: picking diverse
  * exemplars from a near-duplicate-heavy corpus — plain top-k returns k
  * copies of the same boilerplate; MMR returns the spread.
  *
  * Spark-first shape: candidate generation is the ANN tier (bounded m per
  * query); the greedy loop is inherently sequential PER QUERY but
  * embarrassingly parallel ACROSS queries, so it runs as one groupBy over
  * the candidate rows — per-task cost O(k·m·dim), no shuffle beyond the
  * candidate co-group, scale ∝ query count. Deterministic end to end
  * (stable seed order, ties → smallest id), so Verify exports the
  * candidate relevances + pairwise similarity matrix and the oracle
  * replays the greedy selection as k unrolled SQL steps over the SAME
  * stored doubles.
  */
object Mmr {

  /** THE cosine-similarity definition, shared by the executor-side greedy
    * loop and the driver-side aux export — oracle bit-equality requires
    * one arithmetic path. Zero-norm inputs score 0 (maximally dissimilar
    * to everything, mirroring the engine's zero-norm → distance 1 rule).
    */
  private[graft] def cosSim(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Greedy selection for one query's candidates, already id-sorted.
    * Returns the selected indices in pick order.
    */
  private def select(rel: Array[Double], vecs: Array[Array[Float]], k: Int,
      lambda: Double): Array[Int] = {
    val n = rel.length
    val picked = Array.fill(n)(false)
    // max sim of each remaining candidate to the selected set, maintained
    // incrementally: O(k·n) sim evaluations total
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = new scala.collection.mutable.ArrayBuffer[Int](math.min(k, n))
    var step = 0
    while (step < math.min(k, n)) {
      var best = -1; var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val s =
            if (step == 0) rel(i)
            else lambda * rel(i) - (1.0 - lambda) * maxSim(i)
          if (s > bestScore) { bestScore = s; best = i }
          // ties → the earlier (smaller-id) candidate: strict > keeps it
        }
        i += 1
      }
      // all remaining scores NaN (a caller fed NaN relevances/vectors):
      // stop selecting instead of indexing with -1 — partial output, not a
      // task-killing ArrayIndexOutOfBounds
      if (best < 0) return out.toArray
      picked(best) = true
      out += best
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val s = cosSim(vecs(j), vecs(best))
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      step += 1
    }
    out.toArray
  }

  /** Diversified top-k per query. `cands` needs (queryId, corpusId,
    * vecCol ARRAY<FLOAT>, relCol DOUBLE); output (queryId, corpusId,
    * step LONG) with step = 1-based pick order.
    */
  def rerank(
      cands: DataFrame,
      k: Int,
      lambda: Double,
      queryId: String = "query_id",
      corpusId: String = "id",
      vecCol: String = "vector",
      relCol: String = "rel"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = cands.sparkSession
    val kVal = k; val lamVal = lambda
    val schema = StructType(Seq(
      StructField(queryId, cands.schema(queryId).dataType),
      StructField(corpusId, cands.schema(corpusId).dataType),
      StructField("step", LongType, nullable = false)))
    val rows = cands
      .select(col(queryId), col(corpusId),
        col(vecCol).cast("array<float>"), col(relCol).cast("double"))
      .rdd
      .groupBy(_.get(0))
      .flatMap { case (qid, it) =>
        // id-sort for a deterministic scan order (ties → smallest id)
        val cs = it.toArray.sortWith((x, y) => idLt(x.get(1), y.get(1)))
        val rel = cs.map(_.getDouble(3))
        val vecs = cs.map(_.getAs[scala.collection.Seq[Float]](2).toArray)
        select(rel, vecs, kVal, lamVal).iterator.zipWithIndex.map {
          case (ci, step) => Row(qid, cs(ci).get(1), (step + 1).toLong)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  private def idLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Int, y: Int) => x < y
    case (x: String, y: String) => x < y
    case _ => a.toString < b.toString
  }
}
