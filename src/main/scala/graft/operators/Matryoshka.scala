package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SpaceType

/** Matryoshka (coarse-to-fine) KNN: shortlist with a PREFIX of the embedding
  * dimensions, re-rank the shortlist with the full vector.
  *
  * Matryoshka Representation Learning (Kusupati et al., arXiv:2205.13147 —
  * public literature) trains embeddings whose d'-dim prefixes are themselves
  * good embeddings, exactly so retrieval can run the cheap-first funnel this
  * operator implements ("adaptive retrieval" in the paper: shortlist at low
  * d, re-rank at full d). The reference engine has no analog; for an
  * LLM-data pipeline storing MRL-style embeddings this cuts the dominant
  * flat-scan cost to ~d'/d of full-dimension FLOPs — and unlike the PQ/SQ/BQ
  * tiers it needs NO trained model, no codebook, and no second copy of the
  * corpus: `slice` runs inside the same whole-stage-codegen scan loop.
  *
  * Scale design: the shortlist stage is the ExactKnn broadcast-query scan
  * (corpus never shuffles; bounded-heap top-k keeps the exchange at
  * ≤ kCand·partitions rows per query) over sliced vectors, so its cost is
  * the exact scan's × (prefixDim/d). The re-rank is the shared
  * `ExactKnn.exactRerank` id-equi-join — distributed, never a collect.
  * On 100 TB the prefix scan reads the same parquet column (one storage
  * copy); a deployment that wants prefix-only IO writes the prefix as its
  * own column and points `corpusVec` at it — the operator is agnostic.
  *
  * Recall gates live in MatryoshkaSpec; the oracle (`mrl_knn`) is exact KNN
  * restricted to the exported shortlist, the same construction as pq/sq/bq.
  */
object Matryoshka {

  /** Simulate MRL-SHAPED embeddings from generic ones: reweight coordinate
    * j by exp(-j/τ), the coarse-to-fine energy ordering MRL training bakes
    * into real embeddings (arXiv:2205.13147 — leading dims carry most of
    * the discriminative signal, later dims refine). The funnel's stated
    * precondition is exactly this shape; the generic synthetic test
    * embeddings spread energy evenly, which is why the honest penalty sweep
    * reads ~0.47 recall there. Deterministic: one IEEE double exp+multiply
    * per element, cast back to float — both the query path and the oracle's
    * aux export compute the identical bytes.
    */
  /** The τ every shaped artifact shares — the `mrl_knn_shaped` oracle
    * query, `MatryoshkaSpec`'s recall gate, and ScaleBench's shaped rows
    * must measure the SAME shaping or their recall×speedup story silently
    * compares different corpora.
    */
  val DefaultShapeTau = 16.0

  def energyShape(vec: org.apache.spark.sql.Column, tau: Double): org.apache.spark.sql.Column = {
    require(tau > 0, s"tau must be positive, got $tau")
    transform(vec,
      (x, i) => (x.cast("double") * exp(i.cast("double") * lit(-1.0 / tau)))
        .cast("float"))
  }

  /** Prefix-dimension shortlist: top-kCand per query by distance over the
    * first `prefixDim` components. Returns <queryId>, <corpusId>, distance
    * (prefix-space), rnk.
    */
  def shortlist(
      corpus: DataFrame,
      queries: DataFrame,
      prefixDim: Int,
      kCand: Int,
      space: SpaceType,
      corpusId: String = "id",
      corpusVec: String = "vector",
      queryId: String = "query_id",
      queryVec: String = "query_vec"): DataFrame = {
    require(prefixDim > 0, s"prefixDim must be positive, got $prefixDim")
    val c = corpus.select(col(corpusId),
      slice(col(corpusVec), 1, prefixDim).as("__pv"))
    val q = queries.select(col(queryId),
      slice(col(queryVec).cast("array<float>"), 1, prefixDim).as("__pq"))
    ExactKnn.knnAgg(c, q, kCand, space, corpusId, "__pv", queryId, "__pq")
  }

  /** Coarse-to-fine search over a PRE-MATERIALIZED prefix column (the
    * Engine's mrl layout): the shortlist scan reads only (id, prefixCol) —
    * parquet column pruning skips the full-vector bytes entirely, the IO
    * win the `search` overload (one storage copy, same column) cannot
    * have. Re-rank fetches full vectors from `encoded`'s vecCol by id.
    */
  def searchEncoded(
      encoded: DataFrame,
      queries: DataFrame,
      prefixDim: Int,
      kTop: Int,
      space: SpaceType,
      shortlistFactor: Int = 4,
      corpusId: String = "id",
      corpusVec: String = "vector",
      prefixCol: String = "mrl_prefix",
      queryId: String = "query_id",
      queryVec: String = "query_vec"): DataFrame = {
    require(kTop > 0, s"kTop must be positive, got $kTop")
    require(shortlistFactor > 0, s"shortlistFactor must be positive, got $shortlistFactor")
    val q = queries.select(col(queryId),
      slice(col(queryVec).cast("array<float>"), 1, prefixDim).as("__pq"))
    val sl = ExactKnn.knnAgg(encoded.select(col(corpusId), col(prefixCol)),
      q, kTop * shortlistFactor, space, corpusId, prefixCol, queryId, "__pq")
    ExactKnn.exactRerank(sl, encoded.select(col(corpusId), col(corpusVec)),
      queries, kTop, space, corpusId, corpusVec, queryId, queryVec)
  }

  /** Coarse-to-fine search: prefix shortlist of kTop·shortlistFactor, then
    * exact full-dimension re-rank to kTop. `rerank = false` returns the raw
    * shortlist (the aux export the oracle replays).
    */
  def search(
      corpus: DataFrame,
      queries: DataFrame,
      prefixDim: Int,
      kTop: Int,
      space: SpaceType,
      shortlistFactor: Int = 4,
      corpusId: String = "id",
      corpusVec: String = "vector",
      queryId: String = "query_id",
      queryVec: String = "query_vec",
      rerank: Boolean = true): DataFrame = {
    require(kTop > 0, s"kTop must be positive, got $kTop")
    require(shortlistFactor > 0, s"shortlistFactor must be positive, got $shortlistFactor")
    val sl = shortlist(corpus, queries, prefixDim, kTop * shortlistFactor,
      space, corpusId, corpusVec, queryId, queryVec)
    if (!rerank) sl
    else ExactKnn.exactRerank(sl, corpus, queries, kTop, space,
      corpusId, corpusVec, queryId, queryVec)
  }
}
