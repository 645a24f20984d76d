package graft

/** Whole-surface plan audit: every declared query's physical plan, at once.
  *
  * An accidental CartesianProduct is the classic silent scale-killer — it
  * passes every correctness gate at sf0.01 and detonates at 100 TB. The
  * per-query PlanSpec assertions guard the queries we KNEW were risky;
  * this sweep guards the ones we didn't. BroadcastNestedLoopJoin is
  * allowed only for the query families that use it BY DESIGN (a bounded
  * broadcast side — query vectors or a tiny centroid/stats frame —
  * streamed against the corpus), and that allowlist is exact: a new query
  * that introduces one must either justify itself here or restructure.
  */
class PlanAuditSpec extends SparkSpec {

  // BNLJ-by-design: small broadcast side × corpus scan, cost ∝ corpus.
  // (knn family: broadcast query vectors; cluster_assign: broadcast
  // centroids; quantizer tiers: broadcast encoded queries; mmr: exact
  // candidate generation = knn.)
  private val bnljByDesign = Set(
    "knn_l2", "knn_ip", "knn_cos", "knn_hamming", "knn_sql", "knn_filtered",
    "knn_fetch_join", "nn_join", "cluster_assign", "hybrid_rrf",
    // sq_knn_filtered: the sq_knn broadcast-queries scan shape with the
    // eligibility equi-join composed in front of it.
    "ivf_knn_full", "sq_knn", "sq_knn_filtered", "bq_knn", "bq_knn_cos",
    // mrl_knn: the knn broadcast-queries scan shape over prefix-sliced
    // vectors (the shortlist stage IS ExactKnn.knnAgg); the re-rank is an
    // id-equi-join.
    "mrl_knn",
    "mmr_rerank",
    "embed_leakage", "outlier_events", "outlier_iqr",
    // label_agreement: bounded audit sample (<=200 rows, guarded by
    // guardQuerySetSize) broadcast against the corpus — the knn family
    // shape. The full-corpus variant routes through the IVF equi-join
    // path instead (label_agreement_full, asserted BNLJ-free below).
    "label_agreement",
    // hard_negatives: same shape — bounded 200-anchor broadcast against
    // the corpus with a pre-rank label filter (the theta condition is the
    // label mismatch, so BNLJ is the correct physical join).
    "hard_negatives",
    // ir_metrics: ranked hits from the knn_l2 plan (bounded NQ-query
    // broadcast against the corpus scan); the metric algebra after it is
    // equi-joins and constant-width aggregates.
    "ir_metrics",
    // maxsim_knn: bounded Q·T query-token broadcast (40 rows) against the
    // corpus token scan — every (query token, doc token) pair IS the
    // required work (ColBERT MaxSim), so BNLJ is the correct physical join;
    // at scale the corpus side is pre-filtered to ANN shortlists
    // (LateInteraction Scaladoc), which changes the scan, not the join.
    "maxsim_knn") ++
    // scalar folds: crossJoin(broadcast(<single-row aggregate or k-row
    // sketch>)) — a 1-row (or sketch-bounded) build side stamped onto every
    // probe row. Constant-size broadcast at ANY corpus scale: bm25/tfidf
    // fold corpus-level stats (avgdl, N), token_quantiles folds the
    // quantile thresholds, q11/q22 fold a global HAVING threshold,
    // state_diff folds the time midpoint, kmv_overlap joins two k-row
    // sketches, event_cooccurrence folds the distinct-user count.
    Set("bm25_keyword", "tfidf_top_terms", "token_quantiles",
      "q11_important_parts", "q22_idle_customers", "state_diff",
      "kmv_overlap", "event_cooccurrence",
      // mix_allocate folds Σw and the leftover count — two 1-row broadcasts
      // stamped onto a #sources-row frame
      "mix_allocate")

  test("no declared query plans a CartesianProduct; BNLJ only where it is the design") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf0001).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getMessage}")
        }
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljByDesign(name))
        offenders += s"$name: unexpected BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty,
      s"scale-hostile plans:\n  ${offenders.mkString("\n  ")}")
  }
}
