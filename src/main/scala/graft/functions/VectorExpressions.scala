package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.graft.{Bridge, CosDist, HammingNe, L2Sq, NegDot, TopKByDistance}
import org.apache.spark.sql.types.DoubleType

import graft.core.SpaceType

/** Column-level API + SQL registration for the distance family. */
object vfn {
  def l2Sq(a: Column, b: Column): Column =
    Bridge.column(L2Sq(Bridge.expression(a), Bridge.expression(b)))
  def negDot(a: Column, b: Column): Column =
    Bridge.column(NegDot(Bridge.expression(a), Bridge.expression(b)))
  def cosDist(a: Column, b: Column): Column =
    Bridge.column(CosDist(Bridge.expression(a), Bridge.expression(b)))
  def hammingNe(a: Column, b: Column): Column =
    Bridge.column(HammingNe(Bridge.expression(a), Bridge.expression(b)))

  /** Space-type dispatch (reference `internal/index/const.go:3-8`); unlike the
    * reference's silent l2 fallback (`hnsw.go:134-139`), unsupported spaces
    * are a hard error at SpaceType.parse time.
    */
  def distance(a: Column, b: Column, space: SpaceType): Column = space match {
    case SpaceType.L2      => l2Sq(a, b)
    case SpaceType.Ip      => negDot(a, b)
    case SpaceType.Cos     => cosDist(a, b)
    case SpaceType.Hamming => hammingNe(a, b).cast(DoubleType)
  }

  /** Codegen word-n-gram construction (stride 1 = sliding shingles,
    * stride n = disjoint passages); empty array below n tokens.
    */
  def ngrams(tokens: Column, n: Int, stride: Int = 1): Column =
    Bridge.column(org.apache.spark.sql.graft.NGrams(
      Bridge.expression(tokens), n, stride))

  /** Per-row MinHash signature + distinct-shingle count over word n-grams
    * (STRUCT<sigs ARRAY<BIGINT>, n BIGINT>) — bit-identical values to the
    * explode + 63-min aggregation it replaces (see DedupKernels).
    */
  def minhashSig(tokens: Column, n: Int, numHashes: Int): Column =
    Bridge.column(org.apache.spark.sql.graft.MinHashSig(
      Bridge.expression(tokens), n, numHashes))

  /** Per-row 60-bit SimHash signature (md5-nibble votes; see DedupKernels). */
  def simhash60(tokens: Column): Column =
    Bridge.column(org.apache.spark.sql.graft.SimHash60(
      Bridge.expression(tokens)))

  /** Sliding character n-gram windows with a single offset pre-scan (see
    * DedupKernels — the interpreted substring lambda is O(chars²)/row).
    */
  def charGrams(text: Column, n: Int): Column =
    Bridge.column(org.apache.spark.sql.graft.CharGrams(
      Bridge.expression(text), n))

  /** Codegen Bloom membership probe against a filter serialized at plan
    * time — the broadcast-side join pruner (no false negatives; see
    * BloomKernels).
    */
  def bloomMightContain(s: Column, bloomBytes: Array[Byte]): Column =
    Bridge.column(org.apache.spark.sql.graft.BloomMightContain(
      Bridge.expression(s), bloomBytes))

  /** One-pass bounded top-k aggregate: ARRAY<STRUCT<id, distance, rnk>> of
    * the k smallest distances (ties by id). Partial-aggregatable — map tasks
    * ship ≤ k entries per group to the shuffle.
    */
  def topKByDistance(distance: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByDistance(Bridge.expression(distance), Bridge.expression(id), k)
        .toAggregateExpression())

  /** The canonical top-k result shape: bounded-heap top-k per query over
    * `distCol`, exploded to `(queryId, corpusId, distance, rnk)` rows — the
    * tail every KNN path ends with.
    */
  def topKHits(df: DataFrame, distCol: Column, queryId: String, corpusId: String,
      k: Int): DataFrame =
    df.groupBy(col(queryId))
      .agg(topKByDistance(distCol, col(corpusId), k).as("__hits"))
      .select(col(queryId), explode(col("__hits")).as("__h"))
      .select(col(queryId), col("__h.id").as(corpusId),
        col("__h.distance").as("distance"), col("__h.rnk").as("rnk"))

  /** Equi-join with the CORPUS pinned off the broadcast build side.
    *
    * Catalyst picks the smaller size ESTIMATE as the broadcast build side,
    * and a compacted layout's on-disk estimate can undercut the query
    * frame's — silently flipping the plan to "broadcast the corpus"
    * (measured 3× slower at bench scale; an OOM at real scale). A bare
    * merge hint is NOT the fix: join-strategy hints survive AQE
    * re-planning (verified: a hinted SMJ is never demoted to broadcast at
    * runtime), so it would force a full corpus shuffle+sort even when the
    * other side is a handful of serving queries. Instead the OTHER side's
    * own optimized-plan estimate decides: at or under the session
    * broadcast threshold → explicit broadcast of that side (the corpus
    * streams, zero corpus-side Exchange); over → merge hint (the corpus
    * is shuffled, never built into a hash relation). A query frame whose
    * estimate overshoots merely takes the shuffle plan; the catastrophic
    * direction — a big corpus with a small estimate on the build side —
    * is impossible by construction.
    */
  def joinCorpusStreamed(corpus: DataFrame, other: DataFrame,
      joinExprs: Column, estimateInflation: Long = 1): DataFrame =
    if (broadcastable(other, estimateInflation))
      corpus.join(org.apache.spark.sql.functions.broadcast(other), joinExprs)
    else corpus.hint("merge").join(other, joinExprs)

  /** Size-only statistics do not model two things the probe frames do:
    * `explode` (row count × nprobe with no size growth in the estimate)
    * and wide computed array columns (`ArrayType.defaultSize` undercounts
    * a per-row ADC table by orders of magnitude). An explicit broadcast
    * chosen off such an undershot estimate would be un-demotable by AQE —
    * the exact inverse of the bug this helper fixes — so the CALLER
    * passes `estimateInflation`, the worst-case multiplier between the
    * frame's static estimate and its true in-memory size (e.g. nprobe ×
    * bytes-blowup of the added columns). Inflation only ever pushes
    * toward the merge path, whose cost ceiling is the old bare hint.
    */
  private def broadcastable(df: DataFrame, inflation: Long): Boolean = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    threshold > 0 &&
      (df.queryExecution.optimizedPlan.stats.sizeInBytes *
        BigInt(math.max(1L, inflation))) <= BigInt(threshold)
  }

  /** Register all distance functions for SQL use on this session. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "l2_sq")(es => L2Sq(es(0), es(1)))
    Bridge.registerFunction(spark, "neg_dot")(es => NegDot(es(0), es(1)))
    Bridge.registerFunction(spark, "cos_dist")(es => CosDist(es(0), es(1)))
    Bridge.registerFunction(spark, "hamming_ne")(es => HammingNe(es(0), es(1)))
  }
}
