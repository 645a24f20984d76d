package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Training-data curation operators a 100 TB pipeline runs between raw
  * ingest and tokenization: deterministic train/val/test splitting, weighted
  * source mixing, Gopher/C4-style quality rule filtering, passage-level
  * exact dedup, token-budget packing, and event-stream as-of alignment.
  *
  * Everything is hash-deterministic (md5-derived buckets, exact integer
  * arithmetic, rank tie-breaks), so the DuckDB oracle replays each operator
  * bit-for-bit — no RNG, no float aggregation.
  *
  * Scale notes are per-operator; the common theme: per-row projections stay
  * shuffle-free, the only shuffles are constant-width keys (digests, block
  * ids, user ids), and nothing ever needs a global sort or a driver collect.
  */
object PipelineQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** events with `ts` normalized to int64 nanos (Tables.events handles the
    * driver's parquet encodings); all ts math is exact long arithmetic.
    */
  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  private def toks: Column = split(col("text"), " ")

  /** md5-derived integer bucket in [0, mod): `hexOffset` selects which 4 hex
    * chars of the digest feed the bucket, so independent decisions (split
    * assignment vs sampling) draw from decorrelated bits of the same digest.
    * The digest is over the STRING form of the id — both engines agree on
    * int64 rendering.
    */
  private[queries] def hashBucket(id: Column, hexOffset: Int, mod: Int): Column =
    graft.operators.Selection.md5Bucket(id, hexOffset, mod)

  private[queries] def hashBucketSql(id: String, hexOffset: Int, mod: Int): String = {
    val nib = (0 until 4).map { i =>
      val w = 1 << (4 * (3 - i))
      s"(strpos('0123456789abcdef', substr(md5(CAST($id AS VARCHAR)), ${hexOffset + i}, 1)) - 1) * $w"
    }.mkString(" + ")
    s"(($nib) % $mod)"
  }

  // ---- deterministic train/val/test split --------------------------------

  /** Hash-based corpus split (80/10/10): the assignment is a pure function
    * of doc_id, so it is stable across runs, machines, and engine versions —
    * the property a training pipeline needs so eval sets never bleed into
    * train between re-runs. Scale: a shuffle-free projection; the split
    * column also works as a partition key for a split-partitioned write.
    */
  def trainSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = hashBucket(col("doc_id"), 1, 100)
    docs(spark, dir).select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
        .as("split"))
  }

  val trainSplitSql: String = {
    val b = hashBucketSql("doc_id", 1, 100)
    s"""SELECT doc_id, CAST($b AS BIGINT) AS bucket,
       |  CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val' ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  // ---- weighted source mixing (stratified sampling) ----------------------

  /** Deterministic per-source downsampling — the "data mixing" step that
    * reweights corpora (keep 90% of curated sources, 50% of mid, 20% of the
    * tail). Keep/drop is a pure hash decision per doc (digest chars 5-8, so
    * it is independent of the split bucket above). Scale: shuffle-free
    * filter; exact expected fractions need no sampleBy/RNG and replay
    * identically everywhere.
    */
  private val HighSrc = (0 to 4).map(i => s"src$i")
  private val MidSrc = (5 to 9).map(i => s"src$i")

  def sampleSources(spark: SparkSession, dir: String): DataFrame = {
    val permille = when(col("source").isin(HighSrc.map(lit(_)): _*), 900)
      .when(col("source").isin(MidSrc.map(lit(_)): _*), 500)
      .otherwise(200)
    docs(spark, dir)
      .filter(hashBucket(col("doc_id"), 5, 1000) < permille)
      .select(col("doc_id"), col("source"))
  }

  val sampleSourcesSql: String = {
    val high = HighSrc.map(s => s"'$s'").mkString(", ")
    val mid = MidSrc.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, source FROM documents
       |WHERE ${hashBucketSql("doc_id", 5, 1000)} <
       |  CASE WHEN source IN ($high) THEN 900
       |       WHEN source IN ($mid) THEN 500 ELSE 200 END""".stripMargin
  }

  // ---- epoch-weighted mixing (upsampling) --------------------------------

  /** Deterministic epoch-weighted corpus mixing — the UPSAMPLING half of
    * data mixing (`sample_sources` is the downsampling half): high-quality
    * sources repeat for 2.5 training epochs, mid sources run once, tail
    * sources run a 0.25 fractional epoch. Exact integer algebra:
    * n_epochs = whole + (digest bucket < frac·1000), with digest chars
    * 9-12 so the fractional-epoch decision is independent of both the
    * split hash (chars 1-4) and the downsampling hash (chars 5-8). Each
    * output row is one (doc, epoch) training instance — the frame a
    * sequence-packing stage consumes.
    *
    * Scale: shuffle-free — a projection plus a bounded explode (≤ ⌈max w⌉
    * rows per doc); the mixture replays identically on any engine.
    */
  def epochMix(spark: SparkSession, dir: String): DataFrame = {
    val isHigh = col("source").isin(HighSrc.map(lit(_)): _*)
    val isMid = col("source").isin(MidSrc.map(lit(_)): _*)
    val whole = when(isHigh, 2).when(isMid, 1).otherwise(0)
    val fracPm = when(isHigh, 500).when(isMid, 0).otherwise(250)
    val n = (whole +
      when(hashBucket(col("doc_id"), 9, 1000) < fracPm, 1).otherwise(0))
      .cast("long")
    docs(spark, dir)
      .withColumn("__n", n)
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("__n"))).as("epoch"))
  }

  val epochMixSql: String = {
    val high = HighSrc.map(s => s"'$s'").mkString(", ")
    val mid = MidSrc.map(s => s"'$s'").mkString(", ")
    val whole = s"CASE WHEN source IN ($high) THEN 2 WHEN source IN ($mid) THEN 1 ELSE 0 END"
    val fracPm = s"CASE WHEN source IN ($high) THEN 500 WHEN source IN ($mid) THEN 0 ELSE 250 END"
    s"""SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch FROM (
       |  SELECT doc_id, source, unnest(generate_series(1,
       |    $whole + CASE WHEN ${hashBucketSql("doc_id", 9, 1000)} < $fracPm
       |             THEN 1 ELSE 0 END)) AS epoch
       |  FROM documents) t""".stripMargin
  }

  // ---- temperature-weighted mixture allocation ----------------------------

  private val MixBudget = 100000L // token budget to split across sources
  private val MixScale = 1000000L // sqrt-weight fixed-point scale

  /** Temperature-weighted token-budget allocation across sources: the
    * "how many tokens from each domain" mixture step every pretraining run
    * decides (τ = 0.5 down-weights giant domains; the UnifiedScaling /
    * DoReMi literature's standard static form is wᵢ ∝ nᵢ^τ).
    *
    * Determinism: each weight is ONE correctly-rounded IEEE sqrt, one
    * multiply, one floor → fixed-point BIGINT (identical in both engines);
    * everything after is exact integer arithmetic — the largest-remainder
    * method (quota = B·wᵢ div Σw, leftovers to the largest remainders, ties
    * by source) guarantees Σalloc = B exactly, no float shares summed in
    * any order. Fixed-point bound: B·wᵢ must fit int64 — fine to ~10¹²
    * token budgets at this scale; a 100 TB deployment lifts the quota step
    * to DECIMAL(38,0) (same algebra, no other change).
    *
    * Scale: one map-side-combinable groupBy(source); the two scalar folds
    * (Σw, Σq) are 1-row broadcasts and the remainder window sorts #sources
    * rows — constant-size at ANY corpus size (domains are bounded; rows are
    * not).
    */
  def mixAllocate(spark: SparkSession, dir: String): DataFrame = {
    val n = docs(spark, dir)
      .select(col("source"), size(toks).cast("long").as("__t"))
      .groupBy(col("source")).agg(sum(col("__t")).as("n_tok"))
    val w = n.withColumn("w",
      floor(sqrt(col("n_tok").cast("double")) * lit(MixScale.toDouble)).cast("long"))
    // loud failure on a degenerate corpus: sum(w) is NULL (no sources) or 0
    // (all-empty docs) would make the integer `div` below yield null quotas
    // and silently break the Σalloc ≡ budget contract
    val tot = w.agg(sum(col("w")).as("__tw"))
      .select(when(col("__tw") > 0, col("__tw"))
        .otherwise(raise_error(lit(
          "mixAllocate: total weight is zero/null — no sources or all-empty documents")))
        .as("__tw"))
    val q = w.crossJoin(broadcast(tot))
      .withColumn("q", expr(s"$MixBudget * w div __tw"))
      .withColumn("r", expr(s"$MixBudget * w % __tw"))
    val left = q.agg((lit(MixBudget) - sum(col("q"))).as("__lf"))
    // global window over #sources rows — bounded by the domain count, not
    // the corpus (the one place a single-partition sort is the right call)
    val rnk = Window.orderBy(col("r").desc, col("source").asc)
    q.crossJoin(broadcast(left))
      .withColumn("__rnk", row_number().over(rnk))
      .withColumn("alloc",
        (col("q") + when(col("__rnk") <= col("__lf"), 1L).otherwise(0L)).cast("long"))
      .select(col("source"), col("n_tok"), col("w"), col("alloc"))
  }

  val mixAllocateSql: String =
    s"""WITH n AS (
       |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
       |  FROM documents GROUP BY 1),
       |w AS (SELECT source, n_tok,
       |        CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * $MixScale) AS BIGINT) AS w
       |      FROM n),
       |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
       |q AS (SELECT source, n_tok, w,
       |        CAST($MixBudget * w // tw AS BIGINT) AS q,
       |        CAST($MixBudget * w % tw AS BIGINT) AS r
       |      FROM w CROSS JOIN t),
       |l AS (SELECT CAST($MixBudget - sum(q) AS BIGINT) AS lf FROM q)
       |SELECT source, n_tok, w,
       |  CAST(q + CASE WHEN rnk <= lf THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |FROM (SELECT *, row_number() OVER (ORDER BY r DESC, source ASC) AS rnk
       |      FROM q) z CROSS JOIN l""".stripMargin

  // ---- DSIR-style importance resampling ----------------------------------

  /** DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169): the
    * production operator is `Selection.dsirSelect` — see its Scaladoc for
    * the cleared-denominator integer weight form and the scale argument
    * (B-row bounded model collect, linear gram stream, map-side top-K).
    * This declared query gates it end-to-end: target = the curated sources,
    * raw pool = everything else, keep the top-200.
    */
  private val DsirBuckets = 1024
  private val DsirK = 200

  def dsirSelect(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Selection.dsirSelect(docs(spark, dir), "doc_id", "text",
      col("source").isin(HighSrc.map(lit(_)): _*),
      buckets = DsirBuckets, k = DsirK, carryCols = Seq("source"))

  val dsirSelectSql: String = {
    val high = HighSrc.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
       |occ AS (
       |  SELECT doc_id, source, unnest(list_transform(
       |    generate_series(1, len(tk) - 1),
       |    i -> array_to_string(tk[i:i+1], ' '))) AS bg
       |  FROM t WHERE len(tk) >= 2),
       |feat AS (
       |  SELECT doc_id, source, ${hashBucketSql("bg", 1, DsirBuckets)} AS f,
       |    CASE WHEN source IN ($high) THEN 1 ELSE 0 END AS tgt
       |  FROM occ),
       |cnt AS (SELECT f, sum(tgt) AS t_f, sum(1 - tgt) AS r_f
       |        FROM feat GROUP BY f),
       |tot AS (SELECT sum(t_f) AS tt, sum(r_f) AS rt FROM cnt),
       |w AS (SELECT f,
       |        CAST(t_f + 1 AS HUGEINT) * (rt + $DsirBuckets)
       |          - CAST(r_f + 1 AS HUGEINT) * (tt + $DsirBuckets) AS w
       |      FROM cnt CROSS JOIN tot),
       |sc AS (SELECT doc_id, source, CAST(sum(w) AS DOUBLE) AS score
       |       FROM feat JOIN w USING (f) GROUP BY doc_id, source)
       |SELECT doc_id, source, score FROM sc
       |ORDER BY score DESC, doc_id ASC LIMIT $DsirK""".stripMargin
  }

  // ---- fixed-size per-group sampling -------------------------------------

  /** Exactly-n-per-group deterministic sampling: the n docs per source with
    * the smallest md5 digests (digest order = a fixed random permutation,
    * so this IS a uniform sample — but a pure function of ids, replayable
    * anywhere, stable under reruns/partitioning). The companion to
    * `sample_sources` (expected-fraction keep): audits, eval slices, and
    * per-source quotas want exact counts, not rates.
    *
    * Scale: one source-keyed window for the rank — and at 100 TB the
    * rank's sort state per group is bounded by WindowGroupLimit pushing
    * the n-cut into the sort (same mechanism the top-k queries assert).
    */
  private val PerSourceN = 20

  def sampleFixed(spark: SparkSession, dir: String): DataFrame =
    // the digest-rank cap machinery is Selection.clusterCap (groups =
    // sources); one implementation, so the digest/tie-break scheme cannot
    // drift between the per-source and per-cluster variants
    graft.operators.Selection.clusterCap(docs(spark, dir), "source", "doc_id",
        PerSourceN)
      .filter(col("kept") === 1L)
      .select(col("doc_id"), col("source"), col("rnk"))

  val sampleFixedSql: String =
    s"""SELECT doc_id, source, rnk FROM (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rnk
       |  FROM documents) t
       |WHERE rnk <= $PerSourceN""".stripMargin

  // ---- Gopher/C4-style quality rule filter -------------------------------

  /** Rule-based quality filtering (the Gopher/C4 family): token-count
    * bounds, mean-word-length bounds, and top-token repetition cap. All
    * comparisons are exact-integer (3·n ≤ sum_len, max_freq·5 ≤ n) so no
    * float thresholds cross engines. Scale: pure per-row projection over the
    * token array — codegen higher-order functions, no shuffle; the per-doc
    * max-frequency scan is O(distinct·n) on bounded-length documents.
    */
  def qualityRules(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, GramStats}
    // one-pass codegen kernel for the token stats (the interpreted-HOF
    // formulation it replaces is quarantined in ReviewRegressionSpec's
    // equivalence gate via the oracle's quadratic spec form)
    val nTok = size(col("__t")).cast("long")
    val sumLen = col("__gs.sum_len")
    val maxFreq = col("__gs.max_freq")
    docs(spark, dir).withColumn("__t", toks)
      .withColumn("__gs",
        Bridge.column(GramStats(Bridge.expression(col("__t")), 1)))
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        sumLen.as("sum_len"),
        maxFreq.as("max_freq"),
        when(nTok.between(20, 1000), 1L).otherwise(0L).as("ok_len"),
        when(sumLen >= nTok * 3 && sumLen <= nTok * 12, 1L).otherwise(0L).as("ok_wordlen"),
        when(maxFreq * 5 <= nTok, 1L).otherwise(0L).as("ok_rep"))
  }

  val qualityRulesSql: String =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |m AS (SELECT doc_id,
      |  CAST(len(t) AS BIGINT) AS n_tokens,
      |  CAST(list_sum(list_transform(t, w -> strlen(w))) AS BIGINT) AS sum_len,
      |  CAST(list_max(list_transform(list_distinct(t),
      |    w -> len(list_filter(t, x -> x = w)))) AS BIGINT) AS max_freq
      | FROM s)
      |SELECT doc_id, n_tokens, sum_len, max_freq,
      |  CAST(CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS BIGINT) AS ok_len,
      |  CAST(CASE WHEN sum_len >= 3 * n_tokens AND sum_len <= 12 * n_tokens
      |    THEN 1 ELSE 0 END AS BIGINT) AS ok_wordlen,
      |  CAST(CASE WHEN max_freq * 5 <= n_tokens THEN 1 ELSE 0 END AS BIGINT) AS ok_rep
      |FROM m""".stripMargin

  // ---- passage-level exact dedup -----------------------------------------

  /** Passage-level exact dedup (the CCNet/RefinedWeb line-dedup shape, on
    * fixed 8-token passages since the synthetic corpus has no line
    * structure): passages appearing in ≥ 2 distinct documents, with
    * occurrence counts and the keeper. Scale: explode is linear in corpus
    * tokens; the groupBy key is the 16-byte digest (never the passage text),
    * so the shuffle is constant-width; map-side partial aggregation collapses
    * repeats before the exchange.
    */
  private val PassageLen = 8

  def passageDedup(spark: SparkSession, dir: String): DataFrame = {
    // stride = n: disjoint full passages (codegen NGrams kernel)
    val passages = graft.functions.vfn.ngrams(toks, PassageLen, stride = PassageLen)
    docs(spark, dir)
      .filter(size(toks) >= PassageLen)
      .select(col("doc_id"), explode(passages).as("passage"))
      .groupBy(md5(col("passage").cast("binary")).as("passage_hash"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occur"),
        min(col("doc_id")).as("keep_doc"))
      .filter(col("n_docs") >= 2)
  }

  val passageDedupSql: String =
    s"""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ch AS (
       |  -- // not /: DuckDB / is float division and CAST AS INT *rounds*,
       |  -- which would add a partial tail chunk whenever len%8 >= 4
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(0, CAST(len(t) // $PassageLen AS INT) - 1),
       |    i -> array_to_string(t[i*$PassageLen+1:i*$PassageLen+$PassageLen], ' '))) AS passage
       |  FROM s WHERE len(t) >= $PassageLen)
       |SELECT md5(passage) AS passage_hash,
       |  count(DISTINCT doc_id) AS n_docs,
       |  count(*) AS n_occur,
       |  min(doc_id) AS keep_doc
       |FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin

  /** The passage-level boilerplate REMOVAL transform (`passage_dedup` only
    * detects): each doc's text with every cross-doc duplicated 8-token
    * passage cut out, tail tokens kept (see `Dedup.passageScrub`).
    */
  def passageScrub(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.passageScrub(docs(spark, dir), "doc_id", "text",
        n = PassageLen, minDocs = 2)
      .select(col("__did").as("doc_id"), col("clean_text"))

  val passageScrubSql: String =
    s"""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ch AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(0, CAST(len(t) // $PassageLen AS INT) - 1),
       |    i -> {'pos': i, 'chunk':
       |      array_to_string(t[i*$PassageLen+1:i*$PassageLen+$PassageLen], ' ')})) AS u
       |  FROM s WHERE len(t) >= $PassageLen),
       |occ AS (SELECT doc_id, u.pos AS pos, u.chunk AS chunk FROM ch),
       |dup AS (SELECT chunk FROM occ GROUP BY chunk
       |  HAVING count(DISTINCT doc_id) >= 2),
       |kept AS (
       |  SELECT doc_id, list(chunk ORDER BY pos) AS kc FROM occ
       |  WHERE chunk NOT IN (SELECT chunk FROM dup) GROUP BY doc_id)
       |-- array_to_string on an EMPTY list is NULL in DuckDB (Spark's
       |-- array_join gives '') — coalesce aligns the fully-scrubbed docs
       |SELECT s.doc_id, coalesce(array_to_string(
       |    coalesce(k.kc, []) || t[len(t) // $PassageLen * $PassageLen + 1:],
       |    ' '), '') AS clean_text
       |FROM s LEFT JOIN kept k ON s.doc_id = k.doc_id""".stripMargin

  /** The end-of-pipeline CLEAN CORPUS: passage-scrubbed text with a
    * post-scrub token floor (scrubbing can gut a doc to seams; a C4-style
    * pipeline drops what's left below a minimum length). Output is the
    * frame that ships to tokenization.
    */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame =
    // builds ON passage_scrub — one definition of the scrub transform
    passageScrub(spark, dir)
      .withColumn("n_clean_tokens",
        size(split(col("clean_text"), " ")).cast("long"))
      .filter(col("clean_text") =!= "" && col("n_clean_tokens") >= 20)
      .select(col("doc_id"), col("clean_text"), col("n_clean_tokens"))

  /** Oracle: the `passage_scrub` oracle AS a CTE plus the floor — the two
    * queries cannot drift apart on the scrub semantics.
    */
  val cleanCorpusSql: String =
    s"""WITH clean AS ($passageScrubSql)
       |SELECT doc_id, clean_text,
       |  CAST(len(string_split(clean_text, ' ')) AS BIGINT) AS n_clean_tokens
       |FROM clean
       |WHERE clean_text <> '' AND len(string_split(clean_text, ' ')) >= 20""".stripMargin

  // ---- token-budget packing ----------------------------------------------

  /** Greedy context-window packing: docs in doc_id order are concatenated
    * and each doc lands in the bin where its first token falls
    * (bin = floor(tokens_before / budget)) — the "concat then chunk"
    * packing LLM pretraining uses. Scale: a naive global-order cumsum is a
    * single-partition window; instead the prefix sum is hierarchical —
    * per-block window (parallel, partitioned by block id) + a tiny
    * block-totals frame whose own cumsum is broadcast back. Block size
    * bounds the second stage: 10^6 docs/block keeps the block frame
    * thousands of rows at 10^9 docs.
    */
  private val TokenBudget = 2000L
  private val PackBlock = 100L // docs per block (small here; 10^6 at scale)

  def tokenPack(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        (col("doc_id") / PackBlock).cast("long").as("blk"))
    // within-block running total BEFORE each doc (parallel across blocks)
    val wIn = Window.partitionBy(col("blk"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBlk = base.withColumn("before_in_blk",
      coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
    // block totals are ~corpus/PackBlock rows: their prefix sum is the only
    // sequential step and it runs over the tiny aggregated frame
    val wBlk = Window.orderBy(col("blk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkOffsets = base.groupBy(col("blk")).agg(sum(col("n_tokens")).as("blk_total"))
      .withColumn("blk_before", coalesce(sum(col("blk_total")).over(wBlk), lit(0L)))
      .select(col("blk"), col("blk_before"))
    inBlk.join(broadcast(blkOffsets), "blk")
      .select(col("doc_id"), col("n_tokens"),
        ((col("blk_before") + col("before_in_blk")) / TokenBudget).cast("long")
          .as("bin_id"))
  }

  val tokenPackSql: String =
    s"""WITH s AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
       |  FROM s)
       |SELECT doc_id, n_tokens,
       |  CAST(before // $TokenBudget AS BIGINT) AS bin_id
       |FROM c""".stripMargin

  // ---- within-document repetition stats ----------------------------------

  /** Gopher-style within-document repetition: duplicate word-3-gram counts
    * and the hottest 3-gram's frequency — the signal behind "drop documents
    * whose text is mostly the same phrase repeated". All-integer outputs
    * (the rule thresholds divide exactly); pure per-row projection, no
    * shuffle, O(distinct·n) per bounded-length document.
    */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, GramStats}
    // ONE hash-count pass per row inside whole-stage codegen (gram build,
    // dup count, top multiplicity) — replaces three interpreted HOF walks
    // (sorted-run aggregate + transform + array_distinct); the oracle keeps
    // the quadratic declarative spec form, values identical
    docs(spark, dir)
      .filter(size(toks) >= 3)
      .withColumn("__gs",
        Bridge.column(GramStats(Bridge.expression(toks), 3)))
      .select(
        col("doc_id"),
        col("__gs.n_grams").as("n_3grams"),
        col("__gs.n_dup").as("n_dup_3grams"),
        col("__gs.max_freq").as("max_3gram_freq"))
  }

  val repetitionStatsSql: String =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |g AS (SELECT doc_id, list_transform(
      |    generate_series(1, len(t) - 2),
      |    i -> array_to_string(t[i:i+2], ' ')) AS grams FROM s)
      |SELECT doc_id,
      |  CAST(len(grams) AS BIGINT) AS n_3grams,
      |  CAST(len(grams) - len(list_distinct(grams)) AS BIGINT) AS n_dup_3grams,
      |  CAST(list_max(list_transform(list_distinct(grams),
      |    x -> len(list_filter(grams, y -> y = x)))) AS BIGINT) AS max_3gram_freq
      |FROM g""".stripMargin

  // ---- normalization-aware exact dedup -----------------------------------

  /** Exact dedup after text normalization (lowercase, strip non-alnum, '
    * collapse runs of spaces): catches byte-distinct but trivially-mutated
    * duplicates that raw-digest dedup misses. Same constant-width-shuffle
    * shape as dedup_exact — the group key is the digest of the NORMALIZED
    * text, computed per-row in codegen.
    */
  def normDedup(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    docs(spark, dir)
      .groupBy(md5(norm.cast("binary")).as("norm_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  val normDedupSql: String =
    """SELECT md5(trim(regexp_replace(
      |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash,
      |  min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY 1""".stripMargin

  // ---- event as-of join ---------------------------------------------------

  /** As-of join over the event stream: each purchase aligned to the same
    * user's most recent view at-or-before it (ties: latest ts, then highest
    * event_id; purchases with no prior view keep NULL). The classic
    * time-series alignment operator (attribution, feature backfill).
    * Scale: ONE shuffle on user_id and a carry-forward window — never the
    * per-user quadratic view×purchase join the naive formulation (and the
    * oracle, which is declarative-but-quadratic) implies.
    * Precision: DuckDB reads the NANOS parquet µs-truncated, so both the
    * at-or-before comparison and the emitted gap run on `ts div 1000` —
    * microsecond ticks both engines agree on exactly.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"))
    // at equal ts the view sorts first (0 < 1), so "at-or-before" includes
    // it; last() then picks the max-event_id view of the max ts
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc,
        when(col("event_type") === "view", 0).otherwise(1).asc,
        col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastView = last(
      when(col("event_type") === "view", struct(col("ts_us"), col("event_id"))),
      ignoreNulls = true).over(w)
    ev.withColumn("lv", lastView)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        col("lv.event_id").as("view_id"),
        (col("ts_us") - col("lv.ts_us")).as("gap_us"))
  }

  val asofJoinSql: String =
    """WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS tu FROM events
      |           WHERE event_type = 'view'),
      |p AS (SELECT user_id, event_id, epoch_us(ts) AS tu FROM events
      |      WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.event_id, v.event_id AS view_id,
      |    p.tu - v.tu AS gap_us,
      |    row_number() OVER (PARTITION BY p.event_id
      |      ORDER BY v.tu DESC, v.event_id DESC) AS rn
      |  FROM p JOIN v ON p.user_id = v.user_id AND v.tu <= p.tu)
      |SELECT p.event_id, p.user_id, j.view_id, j.gap_us
      |FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON p.event_id = j.event_id""".stripMargin

  // ---- PII / blocklist scrubbing -----------------------------------------

  /** The privacy/content-policy redaction pass (C4-style badwords + standard
    * email/SSN/phone/IP redactors) over the corpus. The synthetic corpus
    * carries no real PII — the PII counts gate the zero path end to end
    * (pattern compilation, counting, redaction no-ops), the blocklist terms
    * DO hit, and `ScrubSpec` drives the PII patterns through the same
    * operator on crafted rows. Scale: a pure per-row codegen map stage — no
    * shuffle, no UDF, patterns are plan literals.
    */
  private val ScrubBlocklist = Seq("vector", "stream", "batch")

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Scrub.scrub(docs(spark, dir), "text", ScrubBlocklist)
      .select(col("doc_id"), col("n_email"), col("n_ssn"), col("n_phone"),
        col("n_ip"), col("n_blocked"), col("clean"), col("pii_free"))

  val piiScrubSql: String =
    s"""SELECT doc_id,${graft.operators.Scrub.scrubSql("text", ScrubBlocklist)}
       |FROM documents""".stripMargin

  // ---- Z-order layout key ------------------------------------------------

  /** The Morton key `Layout.zorder2` clusters by, emitted per event over the
    * (user_id, ts) plane — the layout operator's determinism gate (the
    * reorder itself is value-invariant, so gating the KEY is what proves
    * engines agree on where every row lands). All arithmetic is exact
    * integer shifts/masks/integral division; the domain min/max ride the
    * query. Scale: a second scan-tiny-result agg pass + a shuffle-free
    * projection; `LayoutSpec` gates the actual file-clustering benefit.
    */
  def zorderKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val r = ev.agg(
      min(col("user_id")), max(col("user_id")),
      expr("min(ts) div 1000"), expr("max(ts) div 1000")).first()
    require(!r.isNullAt(0), "zorder_key on an empty events table")
    ev.select(col("event_id"),
      graft.operators.Layout.zkey2(
        col("user_id"), (r.getLong(0), r.getLong(1)),
        expr("ts div 1000"), (r.getLong(2), r.getLong(3))).as("zkey"))
  }

  val zorderKeySql: String =
    s"""WITH d AS (
       |  SELECT min(user_id) AS umin, max(user_id) AS umax,
       |    min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
       |  FROM events)
       |SELECT event_id,
       |  ${graft.operators.Layout.zkey2SqlDyn(
            "user_id", "umin", "umax", "epoch_us(ts)", "tmin", "tmax")} AS zkey
       |FROM events CROSS JOIN d""".stripMargin

  /** The 3-D Morton key (`Layout.zkeyN`) over lineitem's
    * (orderkey, partkey, suppkey) — the n-dim generalization's determinism
    * gate, same construction as `zorder_key`: exact shifts/masks/integral
    * division, domains ride the query.
    */
  def zorder3Key(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val r = li.agg(
      min(col("l_orderkey")), max(col("l_orderkey")),
      min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).first()
    require(!r.isNullAt(0), "zorder3_key on an empty lineitem table")
    li.select(col("l_orderkey"), col("l_linenumber"),
      graft.operators.Layout.zkeyN(Seq(
        (col("l_orderkey"), (r.getLong(0), r.getLong(1))),
        (col("l_partkey"), (r.getLong(2), r.getLong(3))),
        (col("l_suppkey"), (r.getLong(4), r.getLong(5))))).as("zkey"))
  }

  val zorder3KeySql: String =
    s"""WITH d AS (
       |  SELECT min(l_orderkey) AS omin, max(l_orderkey) AS omax,
       |    min(l_partkey) AS pmin, max(l_partkey) AS pmax,
       |    min(l_suppkey) AS smin, max(l_suppkey) AS smax
       |  FROM lineitem)
       |SELECT l_orderkey, l_linenumber,
       |  ${graft.operators.Layout.zkeyNSqlDyn(Seq(
            ("l_orderkey", "omin", "omax"),
            ("l_partkey", "pmin", "pmax"),
            ("l_suppkey", "smin", "smax")))} AS zkey
       |FROM lineitem CROSS JOIN d""".stripMargin

  // ---- edit-distance similarity join (entity resolution) -----------------

  /** Fuzzy name matching over the part catalog: all distinct `p_name` pairs
    * within Levenshtein distance 2 via the chunk-signature join
    * (`FuzzyJoin.editDistanceSelfJoin` — no n² comparison), each annotated
    * with both names' row counts. The record-linkage primitive: cluster
    * near-identical names, then merge their members.
    *
    * Scale: the signature join is linear in DISTINCT names (constant ~45
    * signatures each); counts are one map-side-combined aggregation; the
    * final annotate joins broadcast against the (tiny) pair set.
    */
  def fuzzyPartNames(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir, "part")
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
    val pairs = graft.operators.FuzzyJoin
      .editDistanceSelfJoin(counts.select(col("p_name")), "p_name", 2)
    pairs
      .join(counts.withColumnRenamed("p_name", "a").withColumnRenamed("n", "n_a"), "a")
      .join(counts.withColumnRenamed("p_name", "b").withColumnRenamed("n", "n_b"), "b")
      .select(col("a").as("name_a"), col("b").as("name_b"), col("dist"),
        col("n_a"), col("n_b"))
  }

  /** Oracle: brute-force distinct-pair Levenshtein with the same binary
    * pair ordering. Sound as a gate because the Spark side's blocking is
    * provably complete (FuzzyJoinSpec's brute-force equivalence) — the
    * oracle checks END results, cheaply, on the low-cardinality name set.
    */
  val fuzzyPartNamesSql: String =
    """WITH d AS (SELECT p_name, count(*) AS n FROM part GROUP BY 1)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
      |  a.n AS n_a, b.n AS n_b
      |FROM d a JOIN d b
      |  ON a.p_name < b.p_name
      | AND abs(length(a.p_name) - length(b.p_name)) <= 2
      | AND levenshtein(a.p_name, b.p_name) <= 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_part_names" -> (fuzzyPartNames(_, _)),
    "zorder_key" -> (zorderKey(_, _)),
    "zorder3_key" -> (zorder3Key(_, _)),
    "pii_scrub" -> (piiScrub(_, _)),
    "train_split" -> (trainSplit(_, _)),
    "sample_sources" -> (sampleSources(_, _)),
    "epoch_mix" -> (epochMix(_, _)),
    "mix_allocate" -> (mixAllocate(_, _)),
    "dsir_select" -> (dsirSelect(_, _)),
    "sample_fixed" -> (sampleFixed(_, _)),
    "quality_rules" -> (qualityRules(_, _)),
    "passage_dedup" -> (passageDedup(_, _)),
    "passage_scrub" -> (passageScrub(_, _)),
    "clean_corpus" -> (cleanCorpus(_, _)),
    "token_pack" -> (tokenPack(_, _)),
    "repetition_stats" -> (repetitionStats(_, _)),
    "norm_dedup" -> (normDedup(_, _)),
    "asof_join" -> (asofJoin(_, _)))

  val oracles: Map[String, String] = Map(
    "fuzzy_part_names" -> fuzzyPartNamesSql,
    "zorder_key" -> zorderKeySql,
    "zorder3_key" -> zorder3KeySql,
    "pii_scrub" -> piiScrubSql,
    "train_split" -> trainSplitSql,
    "sample_sources" -> sampleSourcesSql,
    "epoch_mix" -> epochMixSql,
    "mix_allocate" -> mixAllocateSql,
    "dsir_select" -> dsirSelectSql,
    "sample_fixed" -> sampleFixedSql,
    "quality_rules" -> qualityRulesSql,
    "passage_dedup" -> passageDedupSql,
    "passage_scrub" -> passageScrubSql,
    "clean_corpus" -> cleanCorpusSql,
    "token_pack" -> tokenPackSql,
    "repetition_stats" -> repetitionStatsSql,
    "norm_dedup" -> normDedupSql,
    "asof_join" -> asofJoinSql)
}
