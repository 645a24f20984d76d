package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{SpaceType, Tables}
import graft.functions.vfn
import graft.operators.{AnnLsh, BinaryQuant, ExactKnn, GraphAnn, IvfIndex, IvfPq, Matryoshka, Mmr, Opq, ScalarQuant}

/** Vector query pack over the `embeddings` table (64-d float, L2-normalized,
  * 10 labels): exact KNN in all three metric spaces, search-then-fetch,
  * centroid assignment, radius search / near-dup, NN-join.
  *
  * Oracle determinism: distance *ranks* (not raw floats) are emitted; both
  * engines accumulate in double over the identical float32 inputs, so
  * orderings agree (rank flips would require two candidates within ~1 ulp of
  * the same distance — measured gaps are ≫ 1e-12). Ties broken by id.
  */
object VectorQueries {
  private val K = 10
  private val NQ = 10 // queries = vec_id < NQ

  /** Deterministic trainers memoized per (session, dir, key) — see
    * `QueryMemo` for the keying/eviction rationale. A query and its
    * oracle-input aux export recompute the SAME model by construction
    * (Verify runs both; ivf appears in four entries).
    */
  private def cachedModel[T](spark: SparkSession, dir: String, key: String)(f: => T): T =
    QueryMemo.cached(spark, dir, key)(f)

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def knnRanks(spark: SparkSession, dir: String, space: SpaceType): DataFrame =
    ExactKnn.knn(corpus(spark, dir), queriesDf(spark, dir), K, space,
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), col("rnk"))

  private def knnOracle(orderBy: String): String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < $NQ)
       |SELECT qid, vec_id, rnk FROM (
       |  SELECT q.qid, e.vec_id,
       |    row_number() OVER (PARTITION BY q.qid ORDER BY $orderBy, e.vec_id ASC) AS rnk
       |  FROM q CROSS JOIN embeddings e) t
       |WHERE rnk <= $K""".stripMargin

  val knnL2Sql: String =
    knnOracle("list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC")
  /** F4 hamming: count of element-wise differing positions (degenerate on
    * continuous data — near-total ties, broken deterministically by id; the
    * self-match at distance 0 anchors the ranking).
    */
  val knnHammingSql: String = knnOracle(
    "len(list_filter(generate_series(1, len(q.qv)), i -> q.qv[i] <> CAST(e.embedding[i] AS DOUBLE))) ASC")
  val knnCosSql: String =
    knnOracle("list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) DESC")
  val knnIpSql: String =
    knnOracle("list_inner_product(q.qv, CAST(e.embedding AS DOUBLE[])) DESC")

  // ---- late-interaction (multi-vector) retrieval --------------------------

  private val MaxSimToks = 4

  /** Multi-vector corpus/query token frames, carved deterministically from
    * the embeddings table: doc = vec_id DIV MaxSimToks (a pure id function
    * both engines replay); queries are the first `NQ` such documents. One
    * construction feeds both declared MaxSim queries so the carving cannot
    * drift between the exact and the shortlisted variant.
    */
  private def maxsimCorpusToks(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .select(expr(s"vec_id DIV $MaxSimToks").as("doc_id"),
        col("embedding").as("dv"))

  private def maxsimQueryToks(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .filter(col("vec_id") < MaxSimToks * NQ)
      .select(expr(s"vec_id DIV $MaxSimToks").as("qid"),
        expr(s"vec_id % $MaxSimToks").as("tok"), col("embedding").as("qv"))

  /** ColBERT-style MaxSim retrieval over multi-vector documents: the
    * production operator is `LateInteraction.maxSim` — see its Scaladoc for
    * the fixed-order-adds exactness argument and the ANN-shortlist scale
    * path (gated below as `maxsim_knn_ivf`).
    */
  def maxsimKnn(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LateInteraction.maxSim(
      maxsimCorpusToks(spark, dir), maxsimQueryToks(spark, dir), K, MaxSimToks)

  /** One oracle builder for both MaxSim variants: `pairSource` is the FROM
    * clause feeding the per-(qid, doc) max CTE — the all-pairs cross join
    * for the exact query, the aux-restricted join for the shortlisted one
    * (the `restrictedKnnOracle` pattern).
    */
  private def maxsimOracle(pairSource: String): String = {
    val ms = (0 until MaxSimToks).map(i =>
      s"max(CASE WHEN tok = $i THEN list_inner_product(qv, dv) END) AS m$i")
      .mkString(", ")
    val sum = (0 until MaxSimToks)
      .map(i => s"coalesce(m$i, CAST(0 AS DOUBLE))").mkString(" + ")
    s"""WITH ct AS (SELECT vec_id // $MaxSimToks AS doc_id,
       |              CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
       |qt AS (SELECT vec_id // $MaxSimToks AS qid, vec_id % $MaxSimToks AS tok,
       |         CAST(embedding AS DOUBLE[]) AS qv
       |       FROM embeddings WHERE vec_id < ${MaxSimToks * NQ}),
       |m AS (SELECT qt.qid, ct.doc_id, $ms
       |      FROM $pairSource
       |      GROUP BY qt.qid, ct.doc_id),
       |s AS (SELECT qid, doc_id, $sum AS score FROM m)
       |SELECT qid, doc_id, rnk FROM (
       |  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM s) t
       |WHERE rnk <= $K""".stripMargin
  }

  val maxsimKnnSql: String = maxsimOracle("qt CROSS JOIN ct")

  private val MaxSimCandM = 16 // per-token ANN shortlist size

  /** (qid, doc_id) candidate docs for the shortlisted MaxSim: each query
    * token fetches its top-`MaxSimCandM` token vectors through the IVF
    * probe path (same memoized model as the ivf_knn family, nprobe=3), and
    * a doc is a candidate if ANY of its tokens shortlists for ANY of the
    * query's tokens. Deterministic (seeded trainer, id tie-breaks), so the
    * aux export recomputes exactly what the query used.
    *
    * Metric coupling, stated: the probe ranks token neighbors by L2 while
    * MaxSim scores by inner product — equivalent orderings HERE because the
    * embeddings are L2-normalized (l2 = 2 − 2·ip). On a non-normalized
    * corpus train the shortlist model on the MaxSim metric instead
    * (SpaceType.Ip), or the generator optimizes the wrong neighborhood and
    * recall silently decays toward the spec gate.
    */
  private def maxsimShortlist(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val model = ivfModelFor(spark, dir)
    val assigned = IvfIndex.assign(c, "embedding", model)
    val qt = c.filter(col("vec_id") < MaxSimToks * NQ)
      .select(col("vec_id").as("qtok_id"), col("embedding").as("qv"))
    IvfIndex.searchDistributed(assigned, qt, model, MaxSimCandM, nprobe = 3,
        corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qtok_id", queryVec = "qv")
      .select(expr(s"qtok_id DIV $MaxSimToks").as("qid"),
        expr(s"vec_id DIV $MaxSimToks").as("doc_id"))
      .distinct()
  }

  /** MaxSim through ANN candidate generation — `maxsim_knn`'s documented
    * 100 TB path as a gated query: per-token IVF shortlists union into a
    * (qid, doc_id) candidate set, exact MaxSim re-ranks only those docs'
    * tokens (two equi-joins — no BNLJ; plan-audit swept). Oracle replays
    * exact MaxSim restricted to the exported candidate pairs; shortlist
    * recall vs the exact top-k gates in LateInteractionSpec.
    */
  def maxsimKnnIvf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LateInteraction.maxSimShortlisted(
      maxsimShortlist(spark, dir), maxsimCorpusToks(spark, dir),
      maxsimQueryToks(spark, dir), K, MaxSimToks)

  val maxsimKnnIvfSql: String = maxsimOracle(
    """(SELECT qid, doc_id
       |          FROM read_parquet('{AUX}/maxsim_cand/*.parquet')) cand
       |        JOIN ct USING (doc_id) JOIN qt USING (qid)""".stripMargin)

  // ---- offline retrieval evaluation (IR metrics) ---------------------------

  /** Offline retrieval evaluation at scale: precision@k, recall@k and MRR
    * per query against label-derived relevance judgments (relevant = same
    * label, self excluded) — the metric pass every retrieval pipeline runs
    * after an index or model change. Every emitted double is ONE exact IEEE
    * division of integers (p@k = rel_in_k/k, recall = rel_in_k/n_rel,
    * mrr = 1/first_rel_rank), so the oracle replays bit-identically; nDCG
    * is deliberately absent — its log2 discount would hand the gate to
    * libm.
    *
    * Scale: ranked hits come from the same bounded-broadcast knn plan as
    * `knn_l2` (self-exclusion via the k+1 rule — see `labelAgreement`);
    * full-corpus eval swaps candidate generation onto
    * `IvfIndex.searchDistributed`, the `label_agreement_full` pattern, with
    * the metric algebra unchanged. Per-label corpus totals are one
    * constant-width aggregate (≤ label-cardinality rows) broadcast back;
    * the metric aggregation runs over NQ·K hit rows.
    */
  /** Self-excluded exact top-k with BOTH endpoint labels — the shared
    * candidate scaffolding of the label-noise audit (`labelAgreement`) and
    * the IR metrics (`irMetrics`): KNN at k+1, drop the self-match, re-rank
    * (correct even when ≥k duplicates tie at distance 0 — the k+1 nearest
    * overall minus self always contain the k nearest non-self), then
    * broadcast-join the query's label as `qlabel` and the hit's as `label`.
    * One definition of the k+1 self-exclusion rule both queries gate on.
    */
  private def selfExcludedKnnLabels(spark: SparkSession, dir: String,
      nq: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val q = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val labels = emb.select(col("vec_id"), col("label"))
    ExactKnn.knn(emb.select(col("vec_id"), col("embedding")), q, k + 1,
        SpaceType.L2, corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qid", queryVec = "qv")
      .filter(col("qid") =!= col("vec_id"))
      // tiny frame (nq*(k+1) rows): re-rank after the self filter
      .withColumn("r2", row_number()
        .over(Window.partitionBy(col("qid")).orderBy(col("rnk"))).cast("long"))
      .filter(col("r2") <= k)
      .join(broadcast(labels.select(col("vec_id").as("qid"),
        col("label").as("qlabel"))), "qid")
      .join(broadcast(labels), "vec_id")
  }

  def irMetrics(spark: SparkSession, dir: String): DataFrame = {
    val labels = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val totals = labels.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
    selfExcludedKnnLabels(spark, dir, NQ, K)
      .withColumn("rel", when(col("label") === col("qlabel"), 1L).otherwise(0L))
      .groupBy(col("qid"), col("qlabel"))
      .agg(sum(col("rel")).as("rel_in_k"),
        min(when(col("rel") === 1L, col("r2"))).as("first_rel"))
      .join(broadcast(totals.select(col("label").as("qlabel"), col("n_label"))),
        "qlabel")
      .select(col("qid"),
        col("rel_in_k").cast("long").as("rel_in_k"),
        (col("rel_in_k").cast("double") / lit(K)).as("p_at_k"),
        when(col("n_label") === 1L, lit(0.0))
          .otherwise(col("rel_in_k").cast("double") /
            (col("n_label") - 1L).cast("double")).as("recall_at_k"),
        when(col("first_rel").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_rel").cast("double")).as("mrr"))
  }

  val irMetricsSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
       |             label AS qlabel
       |           FROM embeddings WHERE vec_id < $NQ),
       |nn AS (SELECT qid, qlabel, vec_id, rnk FROM (
       |  SELECT q.qid, q.qlabel, e.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC,
       |               e.vec_id ASC) AS rnk
       |  FROM q CROSS JOIN embeddings e) t WHERE rnk <= ${K + 1}),
       |nn2 AS (SELECT qid, qlabel, vec_id,
       |          row_number() OVER (PARTITION BY qid ORDER BY rnk) AS r2
       |        FROM nn WHERE vec_id <> qid),
       |h AS (SELECT n.qid, n.qlabel, n.r2,
       |        CASE WHEN e.label = n.qlabel THEN 1 ELSE 0 END AS rel
       |      FROM nn2 n JOIN embeddings e ON e.vec_id = n.vec_id
       |      WHERE n.r2 <= $K),
       |tot AS (SELECT label, count(*) AS n_label FROM embeddings GROUP BY label),
       |agg AS (SELECT qid, qlabel, sum(rel) AS rel_in_k,
       |          min(CASE WHEN rel = 1 THEN r2 END) AS first_rel
       |        FROM h GROUP BY qid, qlabel)
       |SELECT qid, CAST(rel_in_k AS BIGINT) AS rel_in_k,
       |  CAST(rel_in_k AS DOUBLE) / $K AS p_at_k,
       |  CASE WHEN n_label = 1 THEN CAST(0 AS DOUBLE)
       |       ELSE CAST(rel_in_k AS DOUBLE) / CAST(n_label - 1 AS DOUBLE)
       |  END AS recall_at_k,
       |  CASE WHEN first_rel IS NULL THEN CAST(0 AS DOUBLE)
       |       ELSE CAST(1 AS DOUBLE) / CAST(first_rel AS DOUBLE)
       |  END AS mrr
       |FROM agg JOIN tot ON tot.label = agg.qlabel""".stripMargin

  // ---- Engine-routed MaxSim (multi-vector collection, end-to-end) ---------

  /** One multivector collection built ONCE per (session, dir) — the serving
    * split made honest in the gate: ingest + buildIndex are the memoized
    * build half (a production collection is built once), every query call
    * re-runs the SEARCH half through the Engine surface. The collection
    * ingests the same embeddings carving as `maxsim_knn` (doc = vec_id DIV
    * `MaxSimToks`, token = vec_id % `MaxSimToks`) through the Engine's
    * DataFrame ingest, trains the token-level IVF at buildIndex, and serves
    * MaxSim through per-token IVF shortlists + exact re-rank
    * (`Engine.searchMaxSim`). Query docs are the first `NQ` documents'
    * token vectors, collected driver-side (the REST request shape).
    */
  private def maxsimEngineFor(spark: SparkSession, dir: String)
      : (graft.api.Engine, Seq[(String, Seq[Array[Float]])]) =
    cachedModel(spark, dir, "maxsim_engine") {
      import graft.core.{CollectionConfig, IndexType}
      val root = java.nio.file.Files
        .createTempDirectory("graft_mv_engine_").toString
      val eng = new graft.api.Engine(spark, root)
      eng.createCollection(CollectionConfig("mv", 64, IndexType.IvfFlat,
        SpaceType.L2, params = Map("multivector" -> "true")))
      val sep = eng.MultiVectorSep
      val emb = Tables(spark, dir, "embeddings")
      val docCol = expr(s"CAST(vec_id DIV $MaxSimToks AS STRING)")
      val tokCol = expr(s"CAST(vec_id % $MaxSimToks AS STRING)")
      eng.ingestBatchIndexed("mv", emb.select(
        concat(docCol, lit(sep), tokCol).as("id"),
        col("embedding").cast("array<float>").as("vector"),
        map(
          lit(eng.MultiVectorDocKey), docCol,
          lit(eng.MultiVectorTokKey), tokCol,
          lit(eng.MultiVectorNtokKey), lit(MaxSimToks.toString)).as("params")))
      eng.buildIndex("mv", nlist = 10)
      eng.setParams("mv", Map("nprobe" -> 3, "maxsimCandM" -> MaxSimCandM))
      val qtoks = emb.filter(col("vec_id") < MaxSimToks * NQ)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0),
          r.getAs[scala.collection.Seq[Float]](1).toArray))
        .groupBy(_._1 / MaxSimToks).toSeq
        .map { case (doc, rows) =>
          (doc.toString, rows.sortBy(_._1).map(_._2).toSeq) }
        .sortBy(_._1.toLong)
      (eng, qtoks)
    }

  /** MaxSim through the full Engine/REST serving surface (multivector
    * collection + index layout + searchMaxSim) — ids cast back to the
    * carving's numeric doc keys so the oracle compares against the same
    * BIGINT frame as the batch MaxSim queries. Oracle: exact MaxSim
    * restricted to the engine's own candidate pairs (the `maxsim_knn_ivf`
    * construction, with the Engine in the loop); shortlist recall gates in
    * `LateInteractionSpec`/`EngineSpec`.
    */
  def maxsimEngineKnn(spark: SparkSession, dir: String): DataFrame = {
    val (eng, qtoks) = maxsimEngineFor(spark, dir)
    eng.searchMaxSim("mv", qtoks, K)
      .select(col("qid").cast("long").as("qid"),
        col("doc_id").cast("long").as("doc_id"), col("rnk"))
  }

  /** Aux: the engine's (qid, doc_id) candidate pairs — recomputed from the
    * SAME memoized collection (model fixed at buildIndex, layout current),
    * so the export is exactly the pair set `maxsim_engine` re-ranked.
    */
  def maxsimEngineCandAux(spark: SparkSession, dir: String): DataFrame = {
    val (eng, qtoks) = maxsimEngineFor(spark, dir)
    eng.maxSimCandidates("mv", qtoks)
      .select(col("qid").cast("long").as("qid"),
        col("doc_id").cast("long").as("doc_id"))
  }

  val maxsimEngineSql: String = maxsimOracle(
    """(SELECT qid, doc_id
       |          FROM read_parquet('{AUX}/maxsim_engine_cand/*.parquet')) cand
       |        JOIN ct USING (doc_id) JOIN qt USING (qid)""".stripMargin)

  /** FULL-CORPUS offline IR metrics through the indexed tier — the swap
    * `irMetrics`' docstring promises, landed: every vector is a query,
    * candidates come from `IvfIndex.searchDistributed` (codegen probe lists
    * + cluster_id equi-join; queries shuffle, the corpus does not — the
    * `label_agreement_full` recipe) at nprobe=2 of the shared `ivf10`
    * model; the metric algebra is unchanged (every double one exact integer
    * division). Eval cost ∝ corpus · (nprobe/nlist) · cell size, not
    * corpus². Oracle: the same restricted-candidate replay as
    * `label_agreement_full` (shared `ivf_assign` + `ivf_probes_full`
    * exports) with `irMetrics`' metric tail.
    *
    * Judged-set caveat, stated: relevance is label-derived over the probed
    * candidates, so `recall_at_k` here measures the INDEX+label pipeline
    * jointly (a relevant doc outside the probed cells counts against
    * recall) — exactly what an offline index-quality eval wants.
    */
  def irMetricsFull(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val model = ivfModelFor(spark, dir)
    val assigned = IvfIndex.assign(
      emb.select(col("vec_id"), col("embedding")), "embedding", model)
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val nn = IvfIndex.searchDistributed(assigned, q, model, K + 1, nprobe = 2,
        corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qid", queryVec = "qv")
      .filter(col("qid") =!= col("vec_id")) // k+1 self-exclusion rule
      .withColumn("r2", row_number()
        .over(Window.partitionBy(col("qid")).orderBy(col("rnk"))).cast("long"))
      .filter(col("r2") <= K)
    val labels = emb.select(col("vec_id"), col("label"))
    val totals = labels.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
    nn.join(labels.select(col("vec_id").as("qid"), col("label").as("qlabel")), "qid")
      .join(labels, "vec_id")
      .withColumn("rel", when(col("label") === col("qlabel"), 1L).otherwise(0L))
      .groupBy(col("qid"), col("qlabel"))
      .agg(sum(col("rel")).as("rel_in_k"),
        min(when(col("rel") === 1L, col("r2"))).as("first_rel"))
      .join(broadcast(totals.select(col("label").as("qlabel"), col("n_label"))),
        "qlabel")
      .select(col("qid"),
        col("rel_in_k").cast("long").as("rel_in_k"),
        (col("rel_in_k").cast("double") / lit(K)).as("p_at_k"),
        when(col("n_label") === 1L, lit(0.0))
          .otherwise(col("rel_in_k").cast("double") /
            (col("n_label") - 1L).cast("double")).as("recall_at_k"),
        when(col("first_rel").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_rel").cast("double")).as("mrr"))
  }

  val irMetricsFullSql: String =
    s"""WITH a AS (SELECT vec_id, cluster_id FROM read_parquet('{AUX}/ivf_assign/*.parquet')),
       |p AS (SELECT qid, cid FROM read_parquet('{AUX}/ivf_probes_full/*.parquet')),
       |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
       |      FROM embeddings),
       |pairs AS (
       |  SELECT q.qid, q.qlabel, e.label AS nlabel,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC,
       |               e.vec_id ASC) AS r2
       |  FROM q JOIN p ON p.qid = q.qid
       |         JOIN a ON a.cluster_id = p.cid
       |         JOIN embeddings e ON e.vec_id = a.vec_id
       |  WHERE e.vec_id <> q.qid),
       |h AS (SELECT qid, qlabel, r2,
       |        CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END AS rel
       |      FROM pairs WHERE r2 <= $K),
       |tot AS (SELECT label, count(*) AS n_label FROM embeddings GROUP BY label),
       |agg AS (SELECT qid, qlabel, sum(rel) AS rel_in_k,
       |          min(CASE WHEN rel = 1 THEN r2 END) AS first_rel
       |        FROM h GROUP BY qid, qlabel)
       |SELECT qid, CAST(rel_in_k AS BIGINT) AS rel_in_k,
       |  CAST(rel_in_k AS DOUBLE) / $K AS p_at_k,
       |  CASE WHEN n_label = 1 THEN CAST(0 AS DOUBLE)
       |       ELSE CAST(rel_in_k AS DOUBLE) / CAST(n_label - 1 AS DOUBLE)
       |  END AS recall_at_k,
       |  CASE WHEN first_rel IS NULL THEN CAST(0 AS DOUBLE)
       |       ELSE CAST(1 AS DOUBLE) / CAST(first_rel AS DOUBLE)
       |  END AS mrr
       |FROM agg JOIN tot ON tot.label = agg.qlabel""".stripMargin

  /** Search-then-fetch (SURVEY J1): KNN hits broadcast-joined to document
    * metadata — the reference's per-hit GetDocument loop as one join.
    */
  def knnFetchJoin(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
    ExactKnn.knnFetch(corpus(spark, dir), queriesDf(spark, dir), docs, K,
        SpaceType.L2, corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qid", queryVec = "qv", docId = "doc_id")
      .select(col("qid"), col("rnk"), col("doc_id"), col("lang"), col("source"))
  }

  val knnFetchJoinSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < $NQ),
       |hits AS (
       |  SELECT qid, vec_id, rnk FROM (
       |    SELECT q.qid, e.vec_id,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC, e.vec_id ASC) AS rnk
       |    FROM q CROSS JOIN embeddings e) t
       |  WHERE rnk <= $K)
       |SELECT qid, rnk, doc_id, lang, source
       |FROM documents JOIN hits ON doc_id = vec_id""".stripMargin

  /** Centroid-assignment join (SURVEY J3): every vector → nearest of a fixed
    * centroid set (here: vec_id < 10, standing in for trained centroids so the
    * oracle is deterministic). IVF uses the same shape with KMeans centroids.
    * Scale: centroids broadcast; corpus never shuffles; argmin per row.
    */
  def clusterAssign(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val emb = corpus(spark, dir)
    // argmin over 10 centroids per row: aggregate the broadcast cross product
    val dist = vfn.l2Sq(col("embedding"), col("cv"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d").asc, col("centroid_id").asc)
    emb.crossJoin(broadcast(cents))
      .withColumn("d", dist)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))
  }

  val clusterAssignSql: String =
    """WITH c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
      |           FROM embeddings WHERE vec_id < 10)
      |SELECT vec_id, centroid_id FROM (
      |  SELECT e.vec_id, c.centroid_id,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) ASC, c.centroid_id ASC) AS rn
      |  FROM embeddings e CROSS JOIN c) t
      |WHERE rn = 1""".stripMargin

  /** Embedding-cosine near-dup pairs (radius search over the pair space),
    * declared in its SCALE form: random-hyperplane LSH bucket collisions
    * generate candidates (banded equi-join, never all-pairs), exact cosine
    * verifies each candidate. Verification is exact, so survivors carry no
    * false positives; the table/probe budget below is sized so recall is
    * 1.0 at every gated scale — the DuckDB oracle stays the all-pairs cross
    * join, so a recall miss fails the hash gate loudly rather than passing
    * silently. `embedNearDupExact` keeps the O(n²) baseline for specs.
    */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.embeddingNearDupLsh(
        corpus(spark, dir), "vec_id", "embedding", simThreshold = 0.45,
        numTables = 32)
      .select(col("ia"), col("ib"))

  /** All-pairs exactness baseline for `embedNearDup` — O(n²) by design,
    * spec/oracle use only, never the declared query surface.
    */
  def embedNearDupExact(spark: SparkSession, dir: String): DataFrame = {
    val a = corpus(spark, dir).select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = corpus(spark, dir).select(col("vec_id").as("ib"), col("embedding").as("vb"))
    a.crossJoin(b)
      .filter(col("ia") < col("ib"))
      .withColumn("sim", lit(1.0) - vfn.cosDist(col("va"), col("vb")))
      .filter(col("sim") >= 0.45)
      .select(col("ia"), col("ib"))
  }

  val embedNearDupSql: String =
    """SELECT a.vec_id AS ia, b.vec_id AS ib
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |        CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin

  /** Cross-split SEMANTIC leakage (embedding-space decontamination): train
    * vectors (vec_id ≥ 100) cosine-similar to any eval vector (< 100) —
    * catches the paraphrase contamination n-gram decontam misses. This is
    * the exact cross-join baseline; `Dedup.crossEmbeddingLeakage` is the
    * LSH-bucketed scale path, recall-gated against it in DedupSpec.
    */
  def embedLeakage(spark: SparkSession, dir: String): DataFrame = {
    val t = corpus(spark, dir).filter(col("vec_id") >= 100)
      .select(col("vec_id").as("ia"), col("embedding").as("va"))
    val e = corpus(spark, dir).filter(col("vec_id") < 100)
      .select(col("vec_id").as("ib"), col("embedding").as("vb"))
    t.crossJoin(broadcast(e))
      .withColumn("sim", lit(1.0) - vfn.cosDist(col("va"), col("vb")))
      .filter(col("sim") >= 0.45)
      .select(col("ia"), col("ib"))
  }

  val embedLeakageSql: String =
    """SELECT a.vec_id AS ia, b.vec_id AS ib
      |FROM embeddings a JOIN embeddings b
      |  ON a.vec_id >= 100 AND b.vec_id < 100
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |        CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin

  // ---- hard-negative mining ----------------------------------------------

  private val HnNQ = 200
  private val HnK = 5

  /** Hard-negative mining (triplet/contrastive training prep): for each
    * anchor, the k nearest vectors with a DIFFERENT label. The label filter
    * runs BEFORE the rank, so the result is the true top-k of the
    * different-label subset even when an anchor's whole unfiltered
    * neighborhood shares its label (a top-m-then-filter shortcut silently
    * drops those anchors' hardest negatives). Ranks only are emitted (the
    * knn oracle determinism rule).
    *
    * Scale shape: a bounded anchor sample broadcast against one linear
    * corpus scan — the knn_l2/label_agreement family; a full-corpus mining
    * run swaps candidate generation onto the indexed tiers exactly like
    * `label_agreement_full`, with the label-mismatch filter applied to the
    * probed candidates before the rank.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val anchors = emb.filter(col("vec_id") < HnNQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("__d").asc, col("vec_id").asc)
    emb.crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("__d", vfn.l2Sq(col("qv"), col("embedding")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= HnK)
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  val hardNegativesSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
       |           FROM embeddings WHERE vec_id < $HnNQ)
       |SELECT qid, vec_id, rnk FROM (
       |  SELECT q.qid, e.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC,
       |               e.vec_id ASC) AS rnk
       |  FROM q JOIN embeddings e ON e.label <> q.qlabel) t
       |WHERE rnk <= $HnK""".stripMargin

  // ---- SemDeDup semantic pruning -----------------------------------------

  private val SemTau = 0.3 // within-cluster near-dup similarity threshold

  /** SemDeDup-style semantic pruning (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space, find near-duplicate pairs WITHIN each
    * cluster (cosine ≥ τ), resolve the pair graph to connected components,
    * and keep exactly one exemplar per component — the member LEAST similar
    * to its cluster centroid (the paper's best-performing "low" policy:
    * prototypical near-copies get pruned, the outlier that carries the most
    * signal survives). Output: every vector with its component label and a
    * 0/1 `keep` flag; singletons keep themselves.
    *
    * Scale design: clustering first is the whole point — candidate pairs
    * come from an EQUI-join on the cluster id (one shuffle keyed on
    * cluster_id, never a corpus cross join), so pair work is Σ cᵢ² over
    * cluster sizes, bounded by choosing k ∝ corpus/target-cluster-size
    * (the paper runs 50k clusters at LAION scale; an adversarially hot
    * cluster composes with the same `capBuckets` defense the MinHash
    * pipeline uses). Components run through the hybrid union-find /
    * iterated-join CC; the centroid table is broadcast (k rows). The
    * centroid set here is the same deterministic stand-in `cluster_assign`
    * uses (vec_id < 10) so the oracle replays bit-exactly; a production run
    * swaps in `IvfIndex.train` centroids with identical downstream algebra.
    */
  def semdedupPrune(spark: SparkSession, dir: String): DataFrame = {
    // the deterministic stand-in quantizer: centroid i = vector i (i < 10),
    // a bounded driver read — so this IS the production operator under the
    // oracle gate, assignment (codegen NearestCentroid argmin) included
    val cents = Tables(spark, dir, "embeddings").filter(col("vec_id") < 10)
      .orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    graft.operators.Dedup.semanticPrune(corpus(spark, dir), "vec_id",
      "embedding", IvfIndex.Model(cents, SpaceType.L2), SemTau)
  }

  /** Oracle: the same cluster → within-cluster pairs → transitive closure →
    * keep-least-prototypical pipeline in SQL (recursive-CTE closure, the
    * `dedup_clusters` algebra over cosine edges).
    */
  val semdedupPruneSql: String =
    s"""WITH RECURSIVE
       |c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
       |      FROM embeddings WHERE vec_id < 10),
       |assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT e.vec_id, c.centroid_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) ASC,
       |                 c.centroid_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN c) t WHERE rn = 1),
       |pairs AS (
       |  SELECT aa.vec_id AS ia, ab.vec_id AS ib
       |  FROM assign aa JOIN assign ab
       |    ON aa.centroid_id = ab.centroid_id AND aa.vec_id < ab.vec_id
       |  JOIN embeddings a ON a.vec_id = aa.vec_id
       |  JOIN embeddings b ON b.vec_id = ab.vec_id
       |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |          CAST(b.embedding AS DOUBLE[])) >= $SemTau),
       |edges AS (SELECT ia AS x, ib AS y FROM pairs UNION SELECT ib, ia FROM pairs),
       |reach AS (
       |  SELECT x, y FROM edges
       |  UNION
       |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x),
       |comp AS (SELECT x AS vec_id, least(x, min(y)) AS component
       |         FROM reach GROUP BY x),
       |lab AS (
       |  SELECT e.vec_id, coalesce(cp.component, e.vec_id) AS component,
       |         ass.centroid_id
       |  FROM embeddings e
       |  JOIN assign ass ON ass.vec_id = e.vec_id
       |  LEFT JOIN comp cp ON cp.vec_id = e.vec_id)
       |SELECT l.vec_id, CAST(l.component AS BIGINT) AS component,
       |  CAST(CASE WHEN row_number() OVER (PARTITION BY l.component
       |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) ASC,
       |               l.vec_id ASC) = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM lab l JOIN embeddings e ON e.vec_id = l.vec_id
       |JOIN c ON c.centroid_id = l.centroid_id""".stripMargin

  // ---- cluster-balanced sampling cap -------------------------------------

  private val ClusterCap = 25L

  /** Cluster-balanced curation cap (the D4-family debiasing step, Tirumala
    * et al. 2023, arXiv:2308.12284): the production operator is
    * `Selection.clusterCap` — see its Scaladoc for the digest-rank sampling
    * argument and the k ∝ corpus group-size bound. Assignment here is the
    * codegen NearestCentroid argmin (broadcast centroid literal, zero
    * shuffle — not the BNLJ `cluster_assign` declares for the J3 join
    * shape); the centroid set is the same deterministic stand-in
    * `cluster_assign` / `semdedup_prune` use (vec_id < 10 — a bounded
    * driver read) so the oracle replays the assignment bit-exactly; a
    * production run swaps in `IvfIndex.train` centroids with identical
    * downstream algebra.
    */
  def clusterCapSample(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables(spark, dir, "embeddings").filter(col("vec_id") < 10)
      .orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    val assigned = IvfIndex.assign(corpus(spark, dir), "embedding",
      IvfIndex.Model(cents, SpaceType.L2))
    graft.operators.Selection.clusterCap(assigned, "cluster_id", "vec_id",
        ClusterCap)
      .select(col("vec_id"), col("cluster_id").cast("long").as("cluster_id"),
        col("rnk"), col("kept"))
  }

  /** Oracle: the `semdedup_prune` assignment CTE (same centroids, same
    * argmin tie-break) plus the digest-rank window.
    */
  val clusterCapSampleSql: String =
    s"""WITH c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
       |           FROM embeddings WHERE vec_id < 10),
       |assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT e.vec_id, c.centroid_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) ASC,
       |                 c.centroid_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN c) t WHERE rn = 1)
       |SELECT vec_id, CAST(centroid_id AS BIGINT) AS cluster_id, rnk,
       |  CAST(CASE WHEN rnk <= $ClusterCap THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM (SELECT vec_id, centroid_id,
       |        row_number() OVER (PARTITION BY centroid_id
       |          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) AS rnk
       |      FROM assign) t""".stripMargin

  /** Nearest-neighbor self-join: each vector's single nearest other vector —
    * the k=1 all-pairs KNN a dedup pipeline runs before clustering dups.
    */
  def nnJoin(spark: SparkSession, dir: String): DataFrame = {
    val q = corpus(spark, dir).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // every vector is a query → |corpus|² candidates; the one-pass TopK
    // aggregate keeps per-partition bounded heaps instead of sorting the
    // whole candidate set under a window
    ExactKnn.knnAgg(corpus(spark, dir), q, 2, SpaceType.L2,
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .filter(col("vec_id") =!= col("qid")) // drop self-match
      .filter(col("rnk") <= 2)
      .groupBy(col("qid")).agg(min(col("vec_id")).as("nn_id"))
  }

  val nnJoinSql: String =
    """WITH ranked AS (
      |  SELECT a.vec_id AS qid, b.vec_id,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY list_distance(CAST(a.embedding AS DOUBLE[]),
      |                             CAST(b.embedding AS DOUBLE[])) ASC, b.vec_id ASC) AS rnk
      |  FROM embeddings a CROSS JOIN embeddings b)
      |SELECT qid, min(vec_id) AS nn_id FROM ranked
      |WHERE rnk <= 2 AND vec_id <> qid
      |GROUP BY qid""".stripMargin

  /** IVF with nprobe = nlist probes every inverted list, so results must be
    * IDENTICAL to exact KNN — this validates the whole train/assign/probe/
    * prune/score pipeline against the exact-KNN DuckDB oracle. The pruned
    * variant below (nprobe=2) exercises the actual scale path (rows-only
    * check here; recall gates live in IvfSpec).
    */
  private def ivfModelFor(spark: SparkSession, dir: String): IvfIndex.Model =
    cachedModel(spark, dir, "ivf10")(
      IvfIndex.train(corpus(spark, dir), "embedding", nlist = 10))

  private def ivfKnn(spark: SparkSession, dir: String, nprobeOf: Int => Int): DataFrame = {
    val c = corpus(spark, dir)
    val model = ivfModelFor(spark, dir)
    val assigned = IvfIndex.assign(c, "embedding", model)
    IvfIndex.search(assigned, queriesDf(spark, dir), model, K, nprobeOf(model.nlist),
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  /** The same exact KNN expressed through the SQL surface: registered
    * `l2_sq` function + window group-limit in plain `spark.sql` text —
    * proves the SQL-first path produces the identical oracle-checked plan.
    */
  def knnSql(spark: SparkSession, dir: String): DataFrame = {
    vfn.register(spark)
    Tables(spark, dir, "embeddings").createOrReplaceTempView("embeddings_v")
    spark.sql(
      s"""SELECT qid, vec_id, rnk FROM (
         |  SELECT q.vec_id AS qid, e.vec_id,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY l2_sq(q.embedding, e.embedding) ASC, e.vec_id ASC) AS BIGINT) AS rnk
         |  FROM (SELECT * FROM embeddings_v WHERE vec_id < $NQ) q
         |  CROSS JOIN embeddings_v e) t
         |WHERE rnk <= $K""".stripMargin)
  }

  /** IVFPQ ADC search with exact re-rank. Oracle: exact KNN restricted to
    * the exported ADC shortlist (`pq_shortlist` aux table) — the re-rank
    * stage is rank-by-true-distance over exactly those candidates; recall
    * gates for the ADC stage itself live in PqSpec.
    */
  private def pqEncodedFor(spark: SparkSession, dir: String,
      space: SpaceType): (DataFrame, IvfPq.Model) = {
    val c = corpus(spark, dir)
    val model = cachedModel(spark, dir, s"pq_${space.name}")(
      IvfPq.train(c, "embedding", nlist = 10, m = 8, space = space))
    // spill = the materialized encoded layout (production writes it
    // partitionBy(cluster_id); the query pack writes one temp parquet) —
    // consumers get a file scan, robust to cache clearing between reps
    val encoded = QueryMemo.spilled(spark, dir, s"pq_enc_${space.name}")(
      IvfPq.encode(c, "embedding", model))
    (encoded, model)
  }

  def pqKnn(spark: SparkSession, dir: String,
      space: SpaceType = SpaceType.L2): DataFrame = {
    val (encoded, model) = pqEncodedFor(spark, dir, space)
    IvfPq.search(encoded, queriesDf(spark, dir), model, kTop = K, nprobe = 10,
        corpusId = "vec_id", queryId = "qid", queryVec = "qv",
        rerankVecCol = Some("embedding"))
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  /** The ADC shortlist pqKnn re-ranks (kTop×rerankFactor per query): same
    * deterministic training seed → same model → same shortlist as the query
    * run. Exported by Verify as an oracle input.
    */
  def pqShortlistAux(spark: SparkSession, dir: String,
      space: SpaceType = SpaceType.L2): DataFrame = {
    val (encoded, model) = pqEncodedFor(spark, dir, space)
    IvfPq.search(encoded, queriesDf(spark, dir), model, kTop = K * 8, nprobe = 10,
        corpusId = "vec_id", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"))
  }

  /** OPQ: learned-rotation IVFPQ (SURVEY stretch beyond the reference's
    * fixed-subspace PQ). Same oracle construction as pq_knn: exact KNN
    * restricted to the exported ADC shortlist; the OPQ-beats-PQ recall gate
    * lives in OpqSpec. Re-rank runs in original space, so ranks replay
    * exactly in SQL.
    */
  private def opqEncodedFor(spark: SparkSession, dir: String): (DataFrame, Opq.Model) = {
    val c = corpus(spark, dir)
    val model = cachedModel(spark, dir, "opq")(
      Opq.train(c, "embedding", nlist = 10, m = 8, opqIters = 6))
    val encoded = QueryMemo.spilled(spark, dir, "opq_enc")(
      Opq.encode(c, "embedding", model))
    (encoded, model)
  }

  def opqKnn(spark: SparkSession, dir: String): DataFrame = {
    val (encoded, model) = opqEncodedFor(spark, dir)
    Opq.search(encoded, queriesDf(spark, dir), model, kTop = K, nprobe = 10,
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  /** The ADC shortlist opqKnn re-ranks (same deterministic trainer → same
    * model → same shortlist). Exported by Verify as an oracle input.
    */
  def opqShortlistAux(spark: SparkSession, dir: String): DataFrame = {
    val (encoded, model) = opqEncodedFor(spark, dir)
    Opq.search(encoded, queriesDf(spark, dir), model, kTop = K * 8, nprobe = 10,
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid",
        queryVec = "qv", rerank = false)
      .select(col("qid"), col("vec_id"))
  }

  /** SQ8 scalar-quantized KNN (extra tier beyond the reference): 1-byte/dim
    * codes, asymmetric-distance scan, exact re-rank. Oracle: exact KNN
    * restricted to the exported shortlist (same construction as pq_knn);
    * recall gates live in ScalarQuantSpec.
    */
  private def sqEncodedFor(spark: SparkSession, dir: String): (DataFrame, ScalarQuant.Model) = {
    val c = corpus(spark, dir)
    val model = cachedModel(spark, dir, "sq")(ScalarQuant.train(c, "embedding"))
    val encoded = QueryMemo.spilled(spark, dir, "sq_enc")(
      ScalarQuant.encode(c, "embedding", model))
    (encoded, model)
  }

  def sqKnn(spark: SparkSession, dir: String): DataFrame = {
    val (encoded, model) = sqEncodedFor(spark, dir)
    ScalarQuant.search(encoded, queriesDf(spark, dir), model, kTop = K,
        corpusId = "vec_id", queryId = "qid", queryVec = "qv",
        rerankVecCol = Some("embedding"))
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  /** The SQ shortlist sqKnn re-ranks (min/max training is deterministic). */
  def sqShortlistAux(spark: SparkSession, dir: String): DataFrame = {
    val (encoded, model) = sqEncodedFor(spark, dir)
    ScalarQuant.search(encoded, queriesDf(spark, dir), model, kTop = K * 4,
        corpusId = "vec_id", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"))
  }

  /** Filtered search on the QUANTIZED scan tier: eligibility is an
    * equi-join of the code table against the predicate-filtered corpus ids
    * (the predicate lands in the embeddings scan — pushdown applies; the
    * join is a semi-join shape, never a driver id set), then the usual ADC
    * scan + exact re-rank runs over eligible codes only — every query gets
    * k hits from the eligible subset with full top-k semantics. The same
    * composition applies verbatim to the pq/opq/bq code tables (one
    * representative is gated; the join is tier-independent).
    */
  def sqKnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val (encoded, model) = sqEncodedFor(spark, dir)
    ScalarQuant.search(sqEligible(spark, dir, encoded), queriesDf(spark, dir),
        model, kTop = K, corpusId = "vec_id", queryId = "qid", queryVec = "qv",
        rerankVecCol = Some("embedding"))
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  private def sqEligible(spark: SparkSession, dir: String,
      encoded: DataFrame): DataFrame =
    encoded.join(Tables(spark, dir, "embeddings")
      .filter(col("label") < 5).select(col("vec_id")), "vec_id")

  /** The eligible SQ shortlist sq_knn_filtered re-ranks. */
  def sqFilteredShortlistAux(spark: SparkSession, dir: String): DataFrame = {
    val (encoded, model) = sqEncodedFor(spark, dir)
    ScalarQuant.search(sqEligible(spark, dir, encoded), queriesDf(spark, dir),
        model, kTop = K * 4, corpusId = "vec_id", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"))
  }

  /** BQ binary-quantized KNN (extra tier beyond the reference): 1-bit/dim
    * sign codes (32× compression), XOR+POPCNT Hamming shortlist, exact
    * re-rank with 8× over-fetch (1-bit codes generate candidates, the
    * re-rank ranks them). Oracle: exact KNN restricted to the exported
    * shortlist (the pq_knn/sq_knn construction); recall gates live in
    * BinaryQuantSpec.
    */
  private def bqEncodedFor(spark: SparkSession, dir: String): (DataFrame, BinaryQuant.Model) = {
    val c = corpus(spark, dir)
    val model = cachedModel(spark, dir, "bq")(BinaryQuant.train(c, "embedding"))
    val encoded = QueryMemo.spilled(spark, dir, "bq_enc")(
      BinaryQuant.encode(c, "embedding", model))
    (encoded, model)
  }

  def bqKnn(spark: SparkSession, dir: String,
      space: SpaceType = SpaceType.L2): DataFrame = {
    val (encoded, model) = bqEncodedFor(spark, dir)
    BinaryQuant.search(encoded, queriesDf(spark, dir), model, kTop = K,
        space = space, corpusId = "vec_id", queryId = "qid", queryVec = "qv",
        rerankVecCol = Some("embedding"), rerankFactor = 8)
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  /** The Hamming shortlist bqKnn re-ranks (min/max-midpoint training is
    * deterministic; Hamming ties break by id in the bounded heap).
    */
  def bqShortlistAux(spark: SparkSession, dir: String): DataFrame = {
    val (encoded, model) = bqEncodedFor(spark, dir)
    BinaryQuant.search(encoded, queriesDf(spark, dir), model, kTop = K * 8,
        corpusId = "vec_id", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"))
  }

  /** Matryoshka coarse-to-fine KNN (extra tier beyond the reference):
    * shortlist over the first 16 of 64 dims (¼ of the flat scan's FLOPs,
    * model-free — see `Matryoshka`), exact full-dim re-rank with 4×
    * over-fetch. Oracle: exact KNN restricted to the exported shortlist
    * (the pq/sq/bq construction); recall gates live in MatryoshkaSpec.
    */
  private val MrlPrefixDim = 16

  def mrlKnn(spark: SparkSession, dir: String): DataFrame =
    Matryoshka.search(corpus(spark, dir), queriesDf(spark, dir), MrlPrefixDim,
        K, SpaceType.L2, shortlistFactor = 4, corpusId = "vec_id",
        corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), col("rnk"))

  /** The prefix-dim shortlist mrl_knn re-ranks (`slice` of the same scan —
    * recompute ≡ replay with no trained model at all).
    */
  def mrlShortlistAux(spark: SparkSession, dir: String): DataFrame =
    Matryoshka.search(corpus(spark, dir), queriesDf(spark, dir), MrlPrefixDim,
        K, SpaceType.L2, shortlistFactor = 4, corpusId = "vec_id",
        corpusVec = "embedding", queryId = "qid", queryVec = "qv",
        rerank = false)
      .select(col("qid"), col("vec_id"))

  /** mrl_knn gates the funnel's mechanics on the generic embeddings (where
    * its honest recall penalty is documented); mrl_knn_shaped gates it on
    * data matching the tier's STATED PRECONDITION — an MRL-shaped twin of
    * the same table (`Matryoshka.energyShape`: exp(-j/τ) coordinate
    * reweighting, the structure MRL-trained embeddings have). Oracle: exact
    * KNN over the exported shaped table restricted to the exported
    * shortlist — the same restricted-replay construction as every ANN tier;
    * the shaped vectors themselves ride the aux channel so DuckDB replays
    * the identical float bytes. The recall-≥0.85-with-speedup evidence
    * lives in MatryoshkaSpec (shaped table, factor 4) and the ScaleBench
    * mrl section.
    */
  private val MrlShapeTau = Matryoshka.DefaultShapeTau

  private def shapedCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings").select(col("vec_id"),
      Matryoshka.energyShape(col("embedding"), MrlShapeTau).as("svec"))

  private def shapedQueriesDf(spark: SparkSession, dir: String): DataFrame =
    shapedCorpus(spark, dir).filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("svec").as("qv"))

  def mrlKnnShaped(spark: SparkSession, dir: String): DataFrame =
    Matryoshka.search(shapedCorpus(spark, dir), shapedQueriesDf(spark, dir),
        MrlPrefixDim, K, SpaceType.L2, shortlistFactor = 4,
        corpusId = "vec_id", corpusVec = "svec", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), col("rnk"))

  /** Shaped-corpus shortlist + the shaped table itself (the oracle's inputs). */
  def mrlShapedShortlistAux(spark: SparkSession, dir: String): DataFrame =
    Matryoshka.search(shapedCorpus(spark, dir), shapedQueriesDf(spark, dir),
        MrlPrefixDim, K, SpaceType.L2, shortlistFactor = 4,
        corpusId = "vec_id", corpusVec = "svec", queryId = "qid", queryVec = "qv",
        rerank = false)
      .select(col("qid"), col("vec_id"))

  def mrlShapedCorpusAux(spark: SparkSession, dir: String): DataFrame =
    shapedCorpus(spark, dir)

  private val mrlShapedSql: String =
    s"""WITH sc AS (SELECT vec_id, CAST(svec AS DOUBLE[]) AS v
       |            FROM read_parquet('{AUX}/mrl_shaped_corpus/*.parquet')),
       |q AS (SELECT vec_id AS qid, v AS qv FROM sc WHERE vec_id < $NQ),
       |c AS (SELECT DISTINCT qid, vec_id
       |      FROM read_parquet('{AUX}/mrl_shaped_shortlist/*.parquet'))
       |SELECT qid, vec_id, rnk FROM (
       |  SELECT c.qid, c.vec_id,
       |    row_number() OVER (PARTITION BY c.qid
       |      ORDER BY list_distance(q.qv, sc.v) ASC, c.vec_id ASC) AS rnk
       |  FROM c JOIN q ON q.qid = c.qid JOIN sc ON sc.vec_id = c.vec_id) t
       |WHERE rnk <= $K""".stripMargin

  /** Per-partition NSW graph ANN (rows-only; recall gates in GraphAnnSpec). */
  def graphKnn(spark: SparkSession, dir: String): DataFrame =
    GraphAnn.search(corpus(spark, dir), queriesDf(spark, dir), K, SpaceType.L2,
        ef = 80, corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), col("rnk"))

  /** Filtered search on the GRAPH tier (the last ANN tier to get real
    * filters — exact and IVF already have `knn_filtered` /
    * `ivf_knn_filtered`; the reference parses filters and IGNORES them on
    * every tier): the eligibility predicate rides the corpus scan as a
    * Catalyst boolean column, and the NSW beam harvests only eligible ids
    * while STILL NAVIGATING through ineligible nodes (hnswlib's filtered-
    * search semantics — a selective filter widens the beam instead of
    * starving it or returning ineligible hits). Every returned hit
    * satisfies the predicate; recall vs the exact-filtered ground truth
    * gates in GraphAnnSpec. Oracle: exact-distance replay of the exported
    * eligible candidates.
    */
  def graphKnnFiltered(spark: SparkSession, dir: String): DataFrame =
    GraphAnn.search(graphFilteredCorpus(spark, dir), queriesDf(spark, dir), K,
        SpaceType.L2, ef = 80, corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qid", queryVec = "qv", eligibleCol = Some("elig"))
      .select(col("qid"), col("vec_id"), col("rnk"))

  private def graphFilteredCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), (col("label") < 5).as("elig"))

  /** Eligible per-partition beam candidates for graph_knn_filtered. */
  def graphFilteredCandAux(spark: SparkSession, dir: String): DataFrame =
    GraphAnn.localResults(graphFilteredCorpus(spark, dir), queriesDf(spark, dir),
        K, SpaceType.L2, ef = 80, corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qid", queryVec = "qv", eligibleCol = Some("elig"))
      .select(col("qid"), col("vec_id"))

  private val RouteNlist = 16
  private val RouteNprobe = 4

  /** Deterministic router quantizer shared by the routed query and its
    * candidate aux export (seeded k-means — recompute ≡ replay).
    */
  private def routeModelFor(spark: SparkSession, dir: String): IvfIndex.Model =
    cachedModel(spark, dir, "graph_route") {
      IvfIndex.train(corpus(spark, dir), "embedding", RouteNlist)
    }

  /** Coarse-routed graph ANN: k-means cells + per-cell NSW beams, each query
    * probing only its RouteNprobe nearest cells (GraphAnn.searchRouted — the
    * scale path for the graph tier: per-query cost is routeNprobe·ef,
    * independent of how many partition graphs a 100 TB corpus shards into).
    * Merge is hash-gated against the exact-distance replay of the exported
    * candidates; candidate recall is gated in GraphAnnSpec.
    */
  def graphKnnRouted(spark: SparkSession, dir: String): DataFrame =
    GraphAnn.searchRouted(corpus(spark, dir), queriesDf(spark, dir), K, SpaceType.L2,
        nlist = RouteNlist, routeNprobe = RouteNprobe, ef = 80,
        corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qid", queryVec = "qv",
        model = Some(routeModelFor(spark, dir)))
      .select(col("qid"), col("vec_id"), col("rnk"))

  /** LSH ANN tier (HNSW-capability): rows-only check; recall gates in AnnLshSpec. */
  def lshKnn(spark: SparkSession, dir: String): DataFrame =
    AnnLsh.search(corpus(spark, dir), queriesDf(spark, dir), K, SpaceType.Cos,
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), col("rnk"))

  // ---- oracle-input exports (Verify writes each to outDir/_aux/<name>) ----
  // Everything here is deterministic (seeded trainers, no randomness in NSW
  // build/beam), so recomputing in a separate pass reproduces exactly the
  // model/candidates the query run used.

  /** Full corpus assignment under the ivf_knn_probe model. */
  def ivfAssignAux(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val model = ivfModelFor(spark, dir)
    IvfIndex.assign(c, "embedding", model).select(col("vec_id"), col("cluster_id"))
  }

  /** Probed cluster ids per query at nprobe=2 (the ivf_knn_probe setting). */
  def ivfProbesAux(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val model = ivfModelFor(spark, dir)
    val q = queriesDf(spark, dir)
    val rows = q.collect().flatMap { r =>
      val qv = r.getAs[scala.collection.Seq[Float]](1).toArray
      model.probe(qv, 2).map(cid => Row(r.get(0), cid))
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("qid", q.schema("qid").dataType),
      StructField("cid", IntegerType)))
    )
  }

  /** LSH bucket-collision candidates for lsh_knn (seeded planes). */
  def lshCandAux(spark: SparkSession, dir: String): DataFrame =
    AnnLsh.candidatePairs(corpus(spark, dir), queriesDf(spark, dir),
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"))

  /** Per-partition NSW beam results for graph_knn (pre-merge candidates). */
  def graphCandAux(spark: SparkSession, dir: String): DataFrame =
    GraphAnn.localResults(corpus(spark, dir), queriesDf(spark, dir), K, SpaceType.L2,
        ef = 80, corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"))

  /** Per-cell routed beam results for graph_knn_routed (pre-merge
    * candidates; same router model as the query by construction).
    */
  def graphRoutedCandAux(spark: SparkSession, dir: String): DataFrame =
    GraphAnn.routedLocalResults(corpus(spark, dir), queriesDf(spark, dir), K,
        SpaceType.L2, nlist = RouteNlist, routeNprobe = RouteNprobe, ef = 80,
        corpusId = "vec_id", corpusVec = "embedding",
        queryId = "qid", queryVec = "qv",
        model = Some(routeModelFor(spark, dir)))
      .select(col("qid"), col("vec_id"))

  // ---- filtered KNN (metadata pre-filter — SURVEY P2) ----------------------

  /** Exact KNN restricted to corpus vectors with label < 5 — the filtered
    * vector search the reference parses but silently IGNORES
    * (SURVEY P2); here it is a real pre-filter with full top-k semantics
    * (every query still gets k hits from the eligible subset). The
    * attribute-vs-literal predicate lands in the parquet scan
    * (`PushedFilters: [LessThan(label,5)]` — plan-asserted), so ineligible
    * row groups are pruned by footer stats before the distance kernel ever
    * runs — at 100 TB the predicate prunes before compute, not after
    * ranking (a post-filter would return < k hits).
    */
  def knnFiltered(spark: SparkSession, dir: String): DataFrame =
    ExactKnn.knn(
      corpus(spark, dir).filter(col("label") < 5),
      queriesDf(spark, dir), K, SpaceType.L2,
      corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), col("rnk"))

  val knnFilteredSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < $NQ)
       |SELECT qid, vec_id, rnk FROM (
       |  SELECT q.qid, e.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC,
       |               e.vec_id ASC) AS rnk
       |  FROM q CROSS JOIN embeddings e WHERE e.label < 5) t
       |WHERE rnk <= $K""".stripMargin

  /** Filtered ANN on the INDEXED tier: metadata predicate composed with
    * IVF partition pruning — eligibility filters the probed clusters'
    * members BEFORE ranking, so every query still gets k hits from the
    * eligible subset of its probed lists (exact-tier filtered search is
    * `knn_filtered`; the reference parses the filter and IGNORES it on
    * every tier). Same model/nprobe as `ivf_knn_probe`, so the oracle
    * reuses its assignment + probe-list aux exports with the predicate
    * added.
    */
  def ivfKnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val model = ivfModelFor(spark, dir)
    val assigned = IvfIndex.assign(c, "embedding", model)
      .filter(col("label") < 5)
    IvfIndex.search(assigned, queriesDf(spark, dir), model, K, nprobe = 2,
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  private val ivfFilteredSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < $NQ),
       |a AS (SELECT vec_id, cluster_id FROM read_parquet('{AUX}/ivf_assign/*.parquet')),
       |p AS (SELECT qid, cid FROM read_parquet('{AUX}/ivf_probes/*.parquet'))
       |SELECT qid, vec_id, rnk FROM (
       |  SELECT q.qid, a.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC, a.vec_id ASC) AS rnk
       |  FROM q JOIN p ON p.qid = q.qid
       |         JOIN a ON a.cluster_id = p.cid
       |         JOIN embeddings e ON e.vec_id = a.vec_id
       |  WHERE e.label < 5) t
       |WHERE rnk <= $K""".stripMargin

  // ---- hybrid retrieval (reciprocal-rank fusion) ---------------------------

  /** RRF fusion of two retrievers over the same query set (the l2 and cos
    * exact rankers — rank-only fusion needs no score calibration, which is
    * the point of RRF). Routed through `Fusion.rrf`; score = one double
    * division per list + a two-term sum, so the frame hash-replays.
    */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Fusion.rrf(
      knnRanks(spark, dir, SpaceType.L2),
      knnRanks(spark, dir, SpaceType.Cos),
      qCol = "qid", idCol = "vec_id", rnkCol = "rnk", kRrf = 60, topK = K)

  val hybridRrfSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < $NQ),
       |a AS (SELECT qid, vec_id, rnk FROM (
       |  SELECT q.qid, e.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC,
       |               e.vec_id ASC) AS rnk
       |  FROM q CROSS JOIN embeddings e) t WHERE rnk <= $K),
       |b AS (SELECT qid, vec_id, rnk FROM (
       |  SELECT q.qid, e.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) DESC,
       |               e.vec_id ASC) AS rnk
       |  FROM q CROSS JOIN embeddings e) t WHERE rnk <= $K),
       |f AS (
       |  SELECT coalesce(a.qid, b.qid) AS qid,
       |    coalesce(a.vec_id, b.vec_id) AS vec_id,
       |    -- CAST: a bare 1.0 is DECIMAL in DuckDB; the gate needs the
       |    -- same IEEE double division Spark performs
       |    coalesce(CAST(1 AS DOUBLE) / (60 + a.rnk), CAST(0 AS DOUBLE))
       |      + coalesce(CAST(1 AS DOUBLE) / (60 + b.rnk), CAST(0 AS DOUBLE)) AS rrf_score
       |  FROM a FULL JOIN b ON a.qid = b.qid AND a.vec_id = b.vec_id)
       |SELECT qid, vec_id, rrf_score, rnk FROM (
       |  SELECT qid, vec_id, rrf_score,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY rrf_score DESC, vec_id ASC) AS rnk FROM f) t
       |WHERE rnk <= $K""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_filtered" -> (knnFiltered(_, _)),
    "hybrid_rrf" -> (hybridRrf(_, _)),
    "ivf_knn_full" -> ((s, d) => ivfKnn(s, d, nlist => nlist)),
    "ivf_knn_probe" -> ((s, d) => ivfKnn(s, d, _ => 2)),
    "ivf_knn_filtered" -> (ivfKnnFiltered(_, _)),
    "pq_knn" -> (pqKnn(_, _)),
    "pq_knn_cos" -> ((s, d) => pqKnn(s, d, SpaceType.Cos)),
    "opq_knn" -> (opqKnn(_, _)),
    "sq_knn" -> (sqKnn(_, _)),
    "mrl_knn" -> (mrlKnn(_, _)),
    "mrl_knn_shaped" -> (mrlKnnShaped(_, _)),
    "bq_knn" -> (bqKnn(_, _)),
    // the Hamming candidate set is space-agnostic, so the cos variant
    // re-ranks the SAME shortlist — one aux export serves both oracles
    "bq_knn_cos" -> ((s, d) => bqKnn(s, d, SpaceType.Cos)),
    "graph_knn" -> (graphKnn(_, _)),
    "graph_knn_routed" -> (graphKnnRouted(_, _)),
    "lsh_knn" -> (lshKnn(_, _)),
    "mmr_rerank" -> (mmrRerank(_, _)),
    "knn_l2" -> ((s, d) => knnRanks(s, d, SpaceType.L2)),
    "knn_sql" -> (knnSql(_, _)),
    "knn_hamming" -> ((s, d) => knnRanks(s, d, SpaceType.Hamming)),
    "knn_cos" -> ((s, d) => knnRanks(s, d, SpaceType.Cos)),
    "knn_ip" -> ((s, d) => knnRanks(s, d, SpaceType.Ip)),
    "knn_fetch_join" -> (knnFetchJoin(_, _)),
    "maxsim_knn" -> (maxsimKnn(_, _)),
    "maxsim_knn_ivf" -> (maxsimKnnIvf(_, _)),
    "maxsim_engine" -> (maxsimEngineKnn(_, _)),
    "ir_metrics" -> (irMetrics(_, _)),
    "ir_metrics_full" -> (irMetricsFull(_, _)),
    "graph_knn_filtered" -> (graphKnnFiltered(_, _)),
    "sq_knn_filtered" -> (sqKnnFiltered(_, _)),
    "cluster_assign" -> (clusterAssign(_, _)),
    "embed_neardup" -> (embedNearDup(_, _)),
    "semdedup_prune" -> (semdedupPrune(_, _)),
    "cluster_cap_sample" -> (clusterCapSample(_, _)),
    "hard_negatives" -> (hardNegatives(_, _)),
    "embed_leakage" -> (embedLeakage(_, _)),
    "label_agreement" -> (labelAgreement(_, _)),
    "label_agreement_full" -> (labelAgreementFull(_, _)),
    "nn_join" -> (nnJoin(_, _)))

  // ---- label-noise audit ---------------------------------------------------

  private val AgreeNQ = 200 // audited sample; linear in corpus (see docstring)
  private val AgreeK = 10

  /** k-NN label agreement — the confident-learning-style LABEL-NOISE audit a
    * labeled training set needs before the labels are trusted: for each
    * audited vector, how many of its k nearest (non-self) neighbors share
    * its label; `suspect` flags minority-agreement points (2·agree < k, an
    * exact integer rule) as candidate mislabels.
    *
    * Scale shape: a BOUNDED audit sample (broadcast) against the full
    * corpus — one linear codegen scan per batch, the knn_l2 plan. Auditing
    * an entire 100 TB corpus would swap the candidate generation onto the
    * indexed tiers (ivf/pq `searchDistributed`), exactly like
    * `ivf_knn_filtered`; the agreement algebra is unchanged.
    *
    * Self-exclusion: KNN runs at k+1 and drops the self-match, then
    * re-ranks — correct even when ≥k duplicates tie at distance 0 (the
    * k+1 nearest overall minus self always contain the k nearest non-self).
    */
  def labelAgreement(spark: SparkSession, dir: String): DataFrame =
    selfExcludedKnnLabels(spark, dir, AgreeNQ, AgreeK)
      .groupBy(col("qid").as("vec_id"), col("qlabel").as("label"))
      .agg(sum(when(col("label") === col("qlabel"), 1L).otherwise(0L)).as("agree"))
      .select(col("vec_id"), col("label"),
        col("agree").cast("long").as("agree"),
        when(col("agree") * 2 < AgreeK, 1L).otherwise(0L).as("suspect"))

  /** FULL-CORPUS label-noise audit through the indexed tier: every vector
    * is a query, candidates come from `IvfIndex.searchDistributed` (codegen
    * probe lists + cluster_id equi-join — queries shuffle, the corpus does
    * not; NO broadcast-nested-loop anywhere, plan-audited) at nprobe=2 of
    * the shared `ivf10` model. Neighbor labels join back as plain
    * equi-joins. This is the 100 TB shape the bounded-sample
    * `label_agreement` docstring promises: audit cost ∝ corpus ·
    * (nprobe/nlist) · cell size, not corpus². Oracle: exact agreement
    * algebra restricted to the exported assignment + probe lists, exactly
    * the `ivf_knn_probe` construction.
    *
    * Self-exclusion is the k+1 rule (see `labelAgreement`): the query's own
    * cell is always its nearest centroid, so the self-match is always a
    * candidate and drops deterministically.
    */
  def labelAgreementFull(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val model = ivfModelFor(spark, dir)
    val assigned = IvfIndex.assign(
      emb.select(col("vec_id"), col("embedding")), "embedding", model)
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val nn = IvfIndex.searchDistributed(assigned, q, model, AgreeK + 1, nprobe = 2,
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("r2",
        row_number().over(Window.partitionBy(col("qid")).orderBy(col("rnk"))))
      .filter(col("r2") <= AgreeK)
    val labels = emb.select(col("vec_id"), col("label"))
    nn.join(labels.select(col("vec_id").as("qid"), col("label").as("qlabel")), "qid")
      .join(labels, "vec_id")
      .groupBy(col("qid").as("vec_id"), col("qlabel").as("label"))
      .agg(sum(when(col("label") === col("qlabel"), 1L).otherwise(0L)).as("agree"))
      .select(col("vec_id"), col("label"),
        col("agree").cast("long").as("agree"),
        when(col("agree") * 2 < AgreeK, 1L).otherwise(0L).as("suspect"))
  }

  /** Probed cluster ids for EVERY corpus vector at nprobe=2 — computed with
    * the same codegen `NearestCentroids` kernel the query's probe stage
    * uses (distributed; no driver collect, unlike the bounded
    * `ivfProbesAux`). Exported by Verify as an oracle input.
    */
  def ivfProbesFullAux(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.{Bridge, NearestCentroids}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val model = ivfModelFor(spark, dir)
    val centsLit = Literal.create(
      model.centroids.map(_.toSeq).toSeq, ArrayType(ArrayType(FloatType)))
    corpus(spark, dir).select(col("vec_id").as("qid"),
      explode(Bridge.column(NearestCentroids(
        Bridge.expression(col("embedding").cast("array<float>")), centsLit,
        Literal(2), ip = model.space == SpaceType.Ip))).as("cid"))
  }

  val labelAgreementFullSql: String =
    s"""WITH a AS (SELECT vec_id, cluster_id FROM read_parquet('{AUX}/ivf_assign/*.parquet')),
       |p AS (SELECT qid, cid FROM read_parquet('{AUX}/ivf_probes_full/*.parquet')),
       |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
       |      FROM embeddings),
       |pairs AS (
       |  SELECT q.qid, q.qlabel, e.label AS nlabel,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC,
       |               e.vec_id ASC) AS rnk
       |  FROM q JOIN p ON p.qid = q.qid
       |         JOIN a ON a.cluster_id = p.cid
       |         JOIN embeddings e ON e.vec_id = a.vec_id
       |  WHERE e.vec_id <> q.qid)
       |SELECT qid AS vec_id, qlabel AS label,
       |  CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS agree,
       |  CAST(CASE WHEN 2 * sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
       |       < $AgreeK THEN 1 ELSE 0 END AS BIGINT) AS suspect
       |FROM pairs WHERE rnk <= $AgreeK GROUP BY 1, 2""".stripMargin

  val labelAgreementSql: String =
    s"""WITH pairs AS (
       |  SELECT a.vec_id AS qid, a.label AS qlabel, b.label AS nlabel,
       |    row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY list_distance(CAST(a.embedding AS DOUBLE[]),
       |                             CAST(b.embedding AS DOUBLE[])) ASC,
       |               b.vec_id ASC) AS rnk
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id < $AgreeNQ)
       |SELECT qid AS vec_id, qlabel AS label,
       |  CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS agree,
       |  CAST(CASE WHEN 2 * sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
       |       < $AgreeK THEN 1 ELSE 0 END AS BIGINT) AS suspect
       |FROM pairs WHERE rnk <= $AgreeK GROUP BY 1, 2""".stripMargin

  // ---- MMR diversified re-rank -------------------------------------------

  private val MmrM = 30  // candidates per query (exact cosine top-m)
  private val MmrK = 10
  // λ = 0.5 on purpose: 1−λ equals λ EXACTLY in binary, so the Spark-side
  // `λ·rel − (1−λ)·maxsim` and the oracle's literal `0.5*rel − 0.5*m` are
  // the same doubles (any other λ would need a 17-digit 1−λ literal)
  private val MmrLambda = 0.5

  /** Per-query candidate set for MMR: exact cosine top-30 with rel =
    * 1 − distance (the cosine similarity), vectors joined back on.
    */
  private def mmrCandidates(spark: SparkSession, dir: String): DataFrame =
    ExactKnn.knn(corpus(spark, dir), queriesDf(spark, dir), MmrM, SpaceType.Cos,
        corpusId = "vec_id", corpusVec = "embedding", queryId = "qid", queryVec = "qv")
      .select(col("qid"), col("vec_id"), (lit(1.0) - col("distance")).as("rel"))
      .join(corpus(spark, dir), "vec_id")

  /** Diversified top-k: greedy MMR over the candidate set (see
    * `operators.Mmr`) — the curation op that picks SPREAD exemplars where
    * plain top-k returns k near-copies of the same boilerplate.
    */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame =
    Mmr.rerank(mmrCandidates(spark, dir), MmrK, MmrLambda,
      queryId = "qid", corpusId = "vec_id", vecCol = "embedding", relCol = "rel")

  /** Aux: candidate relevances (qid, vec_id, rel). */
  def mmrCandAux(spark: SparkSession, dir: String): DataFrame =
    mmrCandidates(spark, dir).select(col("qid"), col("vec_id"), col("rel"))

  /** Aux: the pairwise cosine-similarity matrix within each query's
    * candidate set — computed through the SAME `Mmr.cosSim` the greedy
    * loop uses, so the oracle replays the selection over identical
    * doubles. Bounded: NQ queries × m(m−1)/2 pairs.
    */
  def mmrSimsAux(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val cand = mmrCandidates(spark, dir)
    val cs = cand.select(col("qid"), col("vec_id"), col("embedding")).collect()
    val qidType = cand.schema("qid").dataType
    val idType = cand.schema("vec_id").dataType
    val rows = cs.groupBy(_.get(0)).iterator.flatMap { case (qid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      for {
        i <- sorted.indices.iterator
        j <- (i + 1) until sorted.length
      } yield Row(qid, sorted(i).get(1), sorted(j).get(1),
        Mmr.cosSim(sorted(i).getAs[scala.collection.Seq[Float]](2).toArray,
          sorted(j).getAs[scala.collection.Seq[Float]](2).toArray))
    }.toSeq
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("qid", qidType), StructField("ia", idType),
      StructField("ib", idType), StructField("sim", DoubleType))))
  }

  /** Oracle: the greedy MMR selection replayed as MmrK unrolled SQL steps
    * over the exported relevances + similarity matrix (same doubles, same
    * tie-breaks) — a full rows+schema+hash gate on an operator no single
    * SQL query expresses. Every CTE is MATERIALIZED: each sel_i references
    * sel_{i-1} twice (the step join AND the union), so DuckDB's default
    * CTE inlining would expand sel_k to 2^k copies of the whole chain —
    * the un-hinted query never finished; materialized it runs in 0.1 s.
    */
  val mmrRerankSql: String = {
    val steps = (2 to MmrK).map { i =>
      s"""s$i AS MATERIALIZED (SELECT qid, vec_id, $i AS step FROM (
         |  SELECT c.qid, c.vec_id,
         |    row_number() OVER (PARTITION BY c.qid
         |      ORDER BY 0.5 * c.rel - 0.5 * ms.m DESC, c.vec_id ASC) AS rn
         |  FROM cand c
         |  JOIN (SELECT ss.qid, ss.ia AS vec_id, max(ss.sim) AS m
         |        FROM symsims ss JOIN sel${i - 1} p
         |          ON ss.qid = p.qid AND ss.ib = p.vec_id
         |        GROUP BY ss.qid, ss.ia) ms
         |    ON ms.qid = c.qid AND ms.vec_id = c.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} p
         |                    WHERE p.qid = c.qid AND p.vec_id = c.vec_id)
         |  ) t WHERE rn = 1),
         |sel$i AS MATERIALIZED (SELECT qid, vec_id, step FROM sel${i - 1}
         |          UNION ALL SELECT qid, vec_id, step FROM s$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH cand AS MATERIALIZED (SELECT qid, vec_id, rel
       |              FROM read_parquet('{AUX}/mmr_cand/*.parquet')),
       |sims AS MATERIALIZED (SELECT qid, ia, ib, sim
       |         FROM read_parquet('{AUX}/mmr_sims/*.parquet')),
       |symsims AS MATERIALIZED (SELECT qid, ia, ib, sim FROM sims
       |            UNION ALL SELECT qid, ib, ia, sim FROM sims),
       |sel1 AS MATERIALIZED (SELECT qid, vec_id, 1 AS step FROM (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id ASC) AS rn
       |  FROM cand) t WHERE rn = 1),
       |$steps
       |SELECT qid, vec_id, CAST(step AS BIGINT) AS step FROM sel$MmrK""".stripMargin
  }

  /** Restricted-KNN oracle: exact KNN replayed over an exported candidate
    * set (`{AUX}` is substituted by Verify with the aux-table directory).
    * This is a REAL gate on the re-rank/merge stage — rank-by-true-distance
    * with id tie-break over exactly the candidates the approximate tier
    * produced; candidate GENERATION quality is gated by the recall specs.
    */
  private def restrictedKnnOracle(candTable: String, orderBy: String): String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < $NQ),
       |c AS (SELECT DISTINCT qid, vec_id FROM read_parquet('{AUX}/$candTable/*.parquet'))
       |SELECT qid, vec_id, rnk FROM (
       |  SELECT c.qid, c.vec_id,
       |    row_number() OVER (PARTITION BY c.qid ORDER BY $orderBy, c.vec_id ASC) AS rnk
       |  FROM c JOIN q ON q.qid = c.qid JOIN embeddings e ON e.vec_id = c.vec_id) t
       |WHERE rnk <= $K""".stripMargin

  /** ivf_knn_probe: exact KNN restricted to the probed clusters, replayed
    * through the exported assignment + probe-list tables.
    */
  private val ivfProbeSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < $NQ),
       |a AS (SELECT vec_id, cluster_id FROM read_parquet('{AUX}/ivf_assign/*.parquet')),
       |p AS (SELECT qid, cid FROM read_parquet('{AUX}/ivf_probes/*.parquet'))
       |SELECT qid, vec_id, rnk FROM (
       |  SELECT q.qid, a.vec_id,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC, a.vec_id ASC) AS rnk
       |  FROM q JOIN p ON p.qid = q.qid
       |         JOIN a ON a.cluster_id = p.cid
       |         JOIN embeddings e ON e.vec_id = a.vec_id) t
       |WHERE rnk <= $K""".stripMargin

  /** Oracle-input exports: Verify writes each to `outDir/_aux/<key>` before
    * dumping oracle_sql.json (with `{AUX}` substituted to that directory).
    */
  val oracleInputs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ivf_assign" -> (ivfAssignAux(_, _)),
    "ivf_probes" -> (ivfProbesAux(_, _)),
    "ivf_probes_full" -> (ivfProbesFullAux(_, _)),
    "lsh_cand" -> (lshCandAux(_, _)),
    "graph_cand" -> (graphCandAux(_, _)),
    "graph_filtered_cand" -> (graphFilteredCandAux(_, _)),
    "graph_routed_cand" -> (graphRoutedCandAux(_, _)),
    "pq_shortlist" -> (pqShortlistAux(_, _)),
    "pq_cos_shortlist" -> ((s, d) => pqShortlistAux(s, d, SpaceType.Cos)),
    "opq_shortlist" -> (opqShortlistAux(_, _)),
    "sq_shortlist" -> (sqShortlistAux(_, _)),
    "mrl_shortlist" -> (mrlShortlistAux(_, _)),
    "mrl_shaped_shortlist" -> (mrlShapedShortlistAux(_, _)),
    "mrl_shaped_corpus" -> (mrlShapedCorpusAux(_, _)),
    "sq_filtered_shortlist" -> (sqFilteredShortlistAux(_, _)),
    "bq_shortlist" -> (bqShortlistAux(_, _)),
    "mmr_cand" -> (mmrCandAux(_, _)),
    "maxsim_cand" -> (maxsimShortlist(_, _)),
    "maxsim_engine_cand" -> (maxsimEngineCandAux(_, _)),
    "mmr_sims" -> (mmrSimsAux(_, _)))

  val oracles: Map[String, String] = Map(
    "knn_filtered" -> knnFilteredSql,
    "hybrid_rrf" -> hybridRrfSql,
    "ivf_knn_full" -> knnL2Sql, // full probing ≡ exact KNN
    "ivf_knn_probe" -> ivfProbeSql,
    "ivf_knn_filtered" -> ivfFilteredSql,
    "mmr_rerank" -> mmrRerankSql,
    "lsh_knn" -> restrictedKnnOracle("lsh_cand",
      "list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) DESC"),
    "graph_knn" -> restrictedKnnOracle("graph_cand",
      "list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC"),
    "graph_knn_routed" -> restrictedKnnOracle("graph_routed_cand",
      "list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC"),
    "pq_knn" -> restrictedKnnOracle("pq_shortlist",
      "list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC"),
    "pq_knn_cos" -> restrictedKnnOracle("pq_cos_shortlist",
      "list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) DESC"),
    "opq_knn" -> restrictedKnnOracle("opq_shortlist",
      "list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC"),
    "sq_knn" -> restrictedKnnOracle("sq_shortlist",
      "list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC"),
    "mrl_knn" -> restrictedKnnOracle("mrl_shortlist",
      "list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC"),
    "mrl_knn_shaped" -> mrlShapedSql,
    "bq_knn" -> restrictedKnnOracle("bq_shortlist",
      "list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC"),
    "bq_knn_cos" -> restrictedKnnOracle("bq_shortlist",
      "list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) DESC"),
    "knn_l2" -> knnL2Sql,
    "knn_sql" -> knnL2Sql, // identical semantics through the SQL surface
    "knn_hamming" -> knnHammingSql,
    "knn_cos" -> knnCosSql,
    "knn_ip" -> knnIpSql,
    "knn_fetch_join" -> knnFetchJoinSql,
    "maxsim_knn" -> maxsimKnnSql,
    "maxsim_knn_ivf" -> maxsimKnnIvfSql,
    "maxsim_engine" -> maxsimEngineSql,
    "ir_metrics" -> irMetricsSql,
    "ir_metrics_full" -> irMetricsFullSql,
    "graph_knn_filtered" -> restrictedKnnOracle("graph_filtered_cand",
      "list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC"),
    "sq_knn_filtered" -> restrictedKnnOracle("sq_filtered_shortlist",
      "list_distance(q.qv, CAST(e.embedding AS DOUBLE[])) ASC"),
    "cluster_assign" -> clusterAssignSql,
    "embed_neardup" -> embedNearDupSql,
    "semdedup_prune" -> semdedupPruneSql,
    "cluster_cap_sample" -> clusterCapSampleSql,
    "hard_negatives" -> hardNegativesSql,
    "embed_leakage" -> embedLeakageSql,
    "label_agreement" -> labelAgreementSql,
    "label_agreement_full" -> labelAgreementFullSql,
    "nn_join" -> nnJoinSql)
}
