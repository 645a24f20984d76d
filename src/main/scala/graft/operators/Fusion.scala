package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al., SIGIR'09 — public literature):
  * merge two retrievers' per-query rankings into one, scoring each hit
  * `Σ 1/(k + rank_i)` over the lists that contain it. The hybrid-retrieval
  * primitive: lexical (BM25) ⊕ vector (KNN), or two vector spaces — RRF is
  * rank-only, so it needs no score calibration between heterogeneous
  * retrievers.
  *
  * Determinism: each term is ONE IEEE double division and the fused score
  * is a sum of exactly two terms — bit-identical in any engine; ties (same
  * rank multiset) break on id ascending.
  *
  * Scale: one co-partitioned full outer join on (query, id) — both inputs
  * are already top-k-truncated per query, so the join state is k-bounded
  * per query regardless of corpus size — and one per-query window for the
  * final rank. Nothing touches the corpus again.
  */
object Fusion {

  /** Fuse rankings `a` and `b` (columns: `qCol`, `idCol`, `rnkCol` with
    * rank 1 = best). A hit absent from one list contributes 0 from it.
    * Output: (q, id, rrf_score, rnk) with rnk ≤ `topK`.
    */
  def rrf(a: DataFrame, b: DataFrame, qCol: String, idCol: String,
      rnkCol: String, kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val ra = a.select(col(qCol), col(idCol), col(rnkCol).as("__ra"))
    val rb = b.select(col(qCol), col(idCol), col(rnkCol).as("__rb"))
    val joined = ra.join(rb, Seq(qCol, idCol), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(kRrf) + col("__ra")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(kRrf) + col("__rb")), lit(0.0)))
    val w = Window.partitionBy(col(qCol))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    joined
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col(qCol), col(idCol), col("rrf_score"), col("rnk"))
  }
}
