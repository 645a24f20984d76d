package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.SpaceType
import graft.functions.vfn

/** Exact (Flat-parity) batch KNN: a *set* of query vectors against a corpus,
  * top-k per query by ascending distance (reference `FlatIndex.Search`,
  * `internal/index/flat.go:106-136` — SURVEY J2/A1), plus the
  * search-then-fetch metadata join (`internal/db/document.go:228-239` —
  * SURVEY J1).
  *
  * Scale design (100 TB corpus, O(10..10^4) queries):
  *  - The query side is broadcast; the corpus NEVER shuffles for the distance
  *    computation — each corpus partition scores its rows against all queries
  *    inside one whole-stage-codegen loop.
  *  - Top-k uses `row_number` over (query, distance); Catalyst's
  *    `WindowGroupLimit` rewrite (Spark 3.5+) inserts a *partial* group-limit
  *    before the shuffle, so only ≤ k·numPartitions rows per query reach the
  *    exchange — the classic two-phase top-k for free, verified via
  *    `.explain` (WindowGroupLimit Partial/Final around the Exchange).
  *  - Ties broken by corpus id so results are deterministic.
  */
object ExactKnn {

  /** Returns columns: <queryId>, <corpusId>, distance (double), rnk (long, 1-based). */
  def knn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      space: SpaceType,
      corpusId: String = "id",
      corpusVec: String = "vector",
      queryId: String = "query_id",
      queryVec: String = "query_vec"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dist = vfn.distance(col(corpusVec), col(queryVec), space)
    val w = Window.partitionBy(col(queryId)).orderBy(col("distance").asc, col(corpusId).asc)
    corpus
      .crossJoin(broadcast(queries))
      .withColumn("distance", dist)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(queryId), col(corpusId), col("distance"), col("rnk"))
  }

  /** Same result set as `knn`, computed with the custom one-pass TopKByDistance
    * aggregate instead of a window: per-partition bounded heaps + partial
    * aggregation, so the exchange carries ≤ k·numPartitions rows per query and
    * nothing is sorted until the final k-element heap drain. Preferable when
    * the query set is large (the window plan's per-partition sort grows with
    * |queries|·|corpus-partition| while the heaps stay O(k)).
    */
  def knnAgg(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      space: SpaceType,
      corpusId: String = "id",
      corpusVec: String = "vector",
      queryId: String = "query_id",
      queryVec: String = "query_vec"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    knnAggFused(corpus, queries, k, space, corpusId, corpusVec, queryId, queryVec)
      .getOrElse {
        val dist = vfn.distance(col(corpusVec), col(queryVec), space)
        vfn.topKHits(
          corpus.crossJoin(broadcast(queries)).withColumn("__d", dist),
          col("__d"), queryId, corpusId, k)
      }
  }

  /** Query-set size above which the fused scan declines and `knnAgg` takes
    * the broadcast-join plan instead. Both shapes require the query set to
    * be executor-memory-bounded (the join broadcasts it), so this guards
    * pathological misuse rather than adding a constraint.
    */
  private val MaxFusedQueries = sys.env.get("SPARK_GRAFT_MAX_FUSED_QUERIES")
    .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(8192)

  /** The FUSED exact scan (`TopKAllQueries`): collect the query set to a
    * plan literal and answer every query in ONE corpus pass — each corpus
    * vector is extracted once (not once per query) and each (query, row)
    * pair costs the distance kernel plus a heap threshold check. The
    * crossJoin plan pays ~460 ns of per-pair plumbing (BNLJ row, repeated
    * corpus-side array extraction, per-pair aggregate consume — measured at
    * 1.25M rows × 100 queries), which dominates the 64-dim arithmetic;
    * fusing removes it. Same partial-agg exchange shape (≤ nq·k entries per
    * partition), bit-identical results (same `VecKernels`, same heap
    * tie-break). None when the query set exceeds `MaxFusedQueries` or an id
    * type is unsupported — the caller falls back to the join plan.
    */
  private def knnAggFused(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      space: SpaceType,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val supportedId: Set[DataType] = Set(LongType, IntegerType, StringType)
    val qdf = queries.select(col(queryId), col(queryVec).cast("array<float>"))
    val qidType = qdf.schema.head.dataType
    val cidType = corpus.select(col(corpusId)).schema.head.dataType
    if (!supportedId(qidType) || !supportedId(cidType)) return None
    // NOTE the fused plan is EAGER about the query side: the set is
    // collected (one bounded job) at CONSTRUCTION and frozen into a plan
    // literal, while the join fallback re-reads `queries` at every action.
    // Callers here build-and-execute immediately, so the snapshot is the
    // same frame either way; a caller holding the returned frame across
    // query-source mutations would see the construction-time snapshot.
    val rows = qdf.limit(MaxFusedQueries + 1).collect()
    if (rows.length > MaxFusedQueries) return None
    val qids = rows.map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq
    // null or DUPLICATE query ids take the join path: the fallback's
    // groupBy(qid) merges duplicate rows into one heap while a per-row
    // fused answer would emit k rows per ROW — the two plans must never
    // disagree on the same input, so ambiguity routes to the one shape
    // (detected for free on the already-collected driver set)
    if (qids.contains(null) || qids.distinct.length != qids.length) return None
    val qvs = rows.map(r => if (r.isNullAt(1)) null else r.getSeq[Float](1)).toSeq
    val agg = org.apache.spark.sql.graft.TopKAllQueries(
      org.apache.spark.sql.graft.Bridge.expression(col(corpusVec).cast("array<float>")),
      org.apache.spark.sql.graft.Bridge.expression(col(corpusId)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(qids, ArrayType(qidType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(qvs, ArrayType(ArrayType(FloatType))),
      k, space.name).toAggregateExpression()
    Some(corpus.select(col(corpusId), col(corpusVec))
      .agg(org.apache.spark.sql.graft.Bridge.column(agg).as("__all"))
      .select(explode(col("__all")).as("__h"))
      .select(col("__h.qid").as(queryId), col("__h.id").as(corpusId),
        col("__h.distance").as("distance"), col("__h.rnk").as("rnk")))
  }

  /** Exact re-rank of an ANN shortlist, fully distributed: fetch true
    * vectors by id and the query vector by query id (equi-joins — never a
    * broadcast/collect of the query set), rank by exact distance with the
    * bounded-heap top-k. Shared by the PQ/OPQ/SQ quantized tiers.
    */
  def exactRerank(
      shortlist: DataFrame,
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      space: SpaceType,
      corpusId: String = "id",
      corpusVec: String = "vector",
      queryId: String = "query_id",
      queryVec: String = "query_vec"): DataFrame = {
    val q2 = queries.select(col(queryId), col(queryVec).cast("array<float>").as("__qv0"))
    // deliberately a PLAIN join (no strategy hint): `vectors` is the full
    // unpruned corpus frame, so its size estimate is the whole file set and
    // can only undershoot reality by the parquet compression factor — a
    // corpus Catalyst picks for broadcast here is genuinely small, never
    // the pruned-scan underestimate the cluster equi-joins guard against
    // (vfn.joinCorpusStreamed). The shortlist side's estimate, by
    // contrast, derives from the candidate join ABOVE the bounded-heap agg
    // (non-CBO stats don't shrink through aggregates), so any static
    // choice keyed on it would force a corpus-wide sort-merge even for a
    // handful of serving queries — measured 15-20% slower on the quantized
    // bench rows, and a join-strategy hint survives AQE re-planning. Left
    // plain, AQE demotes the static SMJ to broadcasting the shortlist at
    // runtime exactly when it is actually tiny.
    vfn.topKHits(
      shortlist.drop("distance", "rnk")
        .join(vectors.select(col(corpusId), col(corpusVec)), Seq(corpusId))
        .join(q2, Seq(queryId))
        .withColumn("__exact", vfn.distance(col(corpusVec), col("__qv0"), space)),
      col("__exact"), queryId, corpusId, k)
  }

  /** KNN + metadata fetch: reference's per-hit `GetDocument` N+1 loop becomes
    * a single broadcast hash join of the tiny top-k result against the docs
    * table (SURVEY J1).
    */
  def knnFetch(
      corpus: DataFrame,
      queries: DataFrame,
      docs: DataFrame,
      k: Int,
      space: SpaceType,
      corpusId: String = "id",
      corpusVec: String = "vector",
      queryId: String = "query_id",
      queryVec: String = "query_vec",
      docId: String = "id"): DataFrame = {
    val hits = knn(corpus, queries, k, space, corpusId, corpusVec, queryId, queryVec)
    // top-k output is tiny (|queries|·k rows) → broadcast it, stream the docs
    // table; at scale this is a broadcast semi-join-shaped fetch, not a shuffle.
    docs.join(broadcast(hits), docs(docId) === hits(corpusId), "inner")
  }

  /** Radius/range search: all corpus rows within `radius` of any query
    * (same broadcast-the-queries shape; no top-k shuffle at all).
    */
  def radius(
      corpus: DataFrame,
      queries: DataFrame,
      radius: Double,
      space: SpaceType,
      corpusVec: String = "vector",
      queryVec: String = "query_vec"): DataFrame = {
    val dist: Column = vfn.distance(col(corpusVec), col(queryVec), space)
    corpus.crossJoin(broadcast(queries))
      .withColumn("distance", dist)
      .filter(col("distance") <= radius)
  }
}
