package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vfn

/** Late-interaction (multi-vector) retrieval: ColBERT's MaxSim scoring
  * (Khattab & Zaharia 2020, arXiv:2004.12832). A document is a BAG of token
  * vectors rather than one pooled vector; a query is a small fixed set of
  * token vectors; score(q, d) = Σ_t max_{v∈d} ⟨q_t, v⟩ — each query token
  * matches its best document token, and the per-token evidence sums.
  *
  * Replay-exactness: the inner product is the codegen `NegDot` kernel
  * (in-order float→double accumulation — the same reduction DuckDB's
  * `list_inner_product` runs, which is why `knn_ip` hash-matches); the
  * per-token max is an exact selection (order-independent); and the final
  * score is a FIXED-ORDER chain of `nTokens` adds built as one expression —
  * never an aggregate SUM over doubles, whose partial-combine order is
  * nondeterministic. Ranks therefore replay bit-identically, and the
  * declared query emits ranks only (the repo's float-output rule).
  *
  * Scale: query tokens are a bounded broadcast (Q·T rows); corpus token
  * vectors stream through ONE scan with no shuffle before the (qid, doc)
  * partial max-aggregate (map-side combine collapses each partition to at
  * most Q·docs-per-partition rows); the top-k cut is a rank-filtered window
  * (WindowGroupLimit). Corpus-side cost is Q·T inner products per token
  * vector — for large Q·T or corpora, generate candidates first (ANN over
  * token vectors, e.g. `IvfIndex.searchDistributed`, union the per-token
  * shortlists) and run this exact MaxSim only over the shortlisted docs'
  * tokens: the plan is unchanged, `corpusToks` is just pre-filtered.
  */
object LateInteraction {

  /** `corpusToks`: one row per document token vector (`corpusDoc`,
    * `corpusVec`). `queryToks`: one row per query token (`queryId`,
    * `queryTok` in [0, nTokens), `queryVec`); queries may have fewer than
    * `nTokens` tokens (a missing token contributes 0 to the score).
    * Returns the top-`k` documents per query as (queryId, corpusDoc, rnk),
    * ranked by MaxSim desc with `corpusDoc` tie-break.
    */
  def maxSim(corpusToks: DataFrame, queryToks: DataFrame, k: Int,
             nTokens: Int, corpusDoc: String = "doc_id",
             corpusVec: String = "dv", queryId: String = "qid",
             queryTok: String = "tok", queryVec: String = "qv"): DataFrame =
    rankTail(corpusToks.crossJoin(broadcast(queryToks)),
      k, nTokens, corpusDoc, corpusVec, queryId, queryTok, queryVec)

  /** Candidate-restricted exact MaxSim — the documented 100 TB path made
    * concrete: `shortlist` is a (queryId, corpusDoc) candidate-pair frame
    * from any generator (per-token ANN shortlists unioned per query, e.g.
    * `IvfIndex.searchDistributed` over token vectors), and the exact MaxSim
    * score runs only over shortlisted docs' tokens. Plan: two EQUI-joins
    * (shortlist × corpus tokens on the doc key; query tokens broadcast) —
    * the all-pairs BNLJ of `maxSim` is gone, so corpus-side work is
    * Σ |shortlist(q)|·T instead of docs·Q·T. Semantics: identical scoring
    * on the restricted pair set; result quality is the generator's recall
    * (gate it the way the ANN tiers gate theirs).
    */
  /** `broadcastShortlist`: when the caller KNOWS the candidate-pair frame
    * is bounded small (the serving path — queries arrive as a driver Seq,
    * so |shortlist| ≤ queries·T·m), broadcasting it turns the doc-key join
    * into a corpus-scan-side hash probe with NO shuffle of the corpus
    * tokens — the size estimate Catalyst derives for a frame downstream of
    * the probe join/distinct is far too big to pick this on its own. Leave
    * false for distributed query frames of unknown size.
    */
  def maxSimShortlisted(shortlist: DataFrame, corpusToks: DataFrame,
                        queryToks: DataFrame, k: Int, nTokens: Int,
                        corpusDoc: String = "doc_id", corpusVec: String = "dv",
                        queryId: String = "qid", queryTok: String = "tok",
                        queryVec: String = "qv",
                        broadcastShortlist: Boolean = false): DataFrame = {
    val sl = if (broadcastShortlist) broadcast(shortlist) else shortlist
    rankTail(
      sl.join(corpusToks, corpusDoc).join(broadcast(queryToks), queryId),
      k, nTokens, corpusDoc, corpusVec, queryId, queryTok, queryVec)
  }

  /** Shared scoring tail over (queryId, corpusDoc, queryTok, queryVec,
    * corpusVec) pair rows: per-token exact max, fixed-order score adds,
    * rank-filtered window.
    */
  private def rankTail(pairs: DataFrame, k: Int, nTokens: Int,
                       corpusDoc: String, corpusVec: String, queryId: String,
                       queryTok: String, queryVec: String): DataFrame = {
    require(nTokens >= 1, s"nTokens must be >= 1, got $nTokens")
    val sim = -vfn.negDot(col(queryVec), col(corpusVec))
    val maxes = (0 until nTokens).map(i =>
      max(when(col(queryTok) === i, sim)).as(s"__graft_m$i"))
    val score = (0 until nTokens)
      .map(i => coalesce(col(s"__graft_m$i"), lit(0.0d)))
      .reduceLeft(_ + _)
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("__graft_score").desc, col(corpusDoc).asc)
    pairs
      .groupBy(col(queryId), col(corpusDoc))
      .agg(maxes.head, maxes.tail: _*)
      .withColumn("__graft_score", score)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(queryId), col(corpusDoc), col("rnk"))
  }
}
