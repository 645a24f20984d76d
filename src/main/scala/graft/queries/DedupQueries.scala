package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Decontam, Dedup}

/** Dedup query pack over `documents`. `minhash_pairs` is the flagship:
  * MinHash+LSH candidates verified with exact 3-gram Jaccard must reproduce
  * the oracle's brute-force shingle-join answer over the FULL corpus (miss
  * probability at 21 bands × 3 rows is ~3e-7 per qualifying pair).
  * SimHash/fingerprint are hash-defined (rows-only here, gated in DedupSpec).
  */
object DedupQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minHashLshPairs(docs(spark, dir), "doc_id", "text",
        shingleN = 3, numHashes = 63, bands = 21, threshold = 0.8)
      .select(col("ia"), col("ib"), col("jaccard"))

  /** Brute-force exact 3-gram Jaccard over all pairs sharing ≥1 shingle. */
  val minhashPairsSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(string_split(text, ' ')) >= 3
      |      THEN list_transform(
      |        generate_series(1, len(string_split(text, ' ')) - 2),
      |        i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))
      |      ELSE [text] END)) AS s
      |  FROM documents),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      |  FROM sh a JOIN sh b ON a.s = b.s WHERE a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT ia, ib, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = ia
      |JOIN sizes sb ON sb.doc_id = ib
      |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8""".stripMargin

  /** Cross-corpus decontamination: "training" docs (doc_id ≥ 100) that
    * near-duplicate any "eval" doc (doc_id < 100) — the contamination scan
    * every training pipeline runs against its held-out sets. Bucketed A×B
    * band join, exact Jaccard verify; the oracle replays the full
    * brute-force cross join.
    */
  def decontamPairs(spark: SparkSession, dir: String): DataFrame = {
    val train = docs(spark, dir).filter(col("doc_id") >= 100)
    val eval = docs(spark, dir).filter(col("doc_id") < 100)
    Dedup.crossCorpusNearDup(train, "doc_id", "text", eval, "doc_id", "text",
        shingleN = 3, numHashes = 63, bands = 21, threshold = 0.8)
      .select(col("ia"), col("ib"), col("jaccard"))
  }

  /** Brute-force exact cross-corpus Jaccard (train ≥ 100 × eval < 100). */
  val decontamPairsSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(string_split(text, ' ')) >= 3
      |      THEN list_transform(
      |        generate_series(1, len(string_split(text, ' ')) - 2),
      |        i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))
      |      ELSE [text] END)) AS s
      |  FROM documents),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      |  FROM sh a JOIN sh b ON a.s = b.s
      |  WHERE a.doc_id >= 100 AND b.doc_id < 100
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT ia, ib, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = ia
      |JOIN sizes sb ON sb.doc_id = ib
      |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8""".stripMargin

  /** The decontamination DECISION: the training corpus with every
    * contaminated doc REMOVED (`decontam_pairs` only detects) — a
    * broadcast-able anti-join of the training side against the detected
    * pair set's ia column; output ∝ the clean corpus, the frame the next
    * pipeline stage actually trains on.
    */
  def decontamClean(spark: SparkSession, dir: String): DataFrame = {
    // builds ON decontam_pairs — one definition of "contaminated"
    val contaminated = decontamPairs(spark, dir).select(col("ia").as("doc_id"))
    docs(spark, dir).filter(col("doc_id") >= 100)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** Oracle: the `decontam_pairs` oracle AS a CTE, anti-joined — the two
    * queries cannot drift apart on what "contaminated" means.
    */
  val decontamCleanSql: String =
    s"""WITH pairs AS ($decontamPairsSql)
       |SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE doc_id >= 100
       |  AND doc_id NOT IN (SELECT ia FROM pairs)""".stripMargin

  /** Exact 5-gram containment decontamination, Bloom-pruned: training docs
    * (doc_id ≥ 100) sharing any 5-gram with an eval doc (doc_id < 100),
    * with the count of shared grams. Unlike `decontam_pairs` (Jaccard
    * near-dup), this is the long-n-gram EXACT overlap scan; the corpus
    * gram stream is pre-filtered by a broadcast Bloom over eval grams, so
    * only matching grams (+ ~1% false positives) ever reach the shuffle —
    * the join is exact, so the result is too.
    */
  def contamNgrams(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Decontam.ngramContamination(
      d.filter(col("doc_id") >= 100), "doc_id", "text",
      d.filter(col("doc_id") < 100), "doc_id", "text", n = 5)
  }

  /** Brute-force exact 5-gram overlap counts (the Bloom never changes the
    * answer — it only prunes).
    */
  val contamNgramsSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(string_split(text, ' ')) >= 5
      |      THEN list_transform(
      |        generate_series(1, len(string_split(text, ' ')) - 4),
      |        i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))
      |      ELSE [text] END)) AS s
      |  FROM documents)
      |SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS n_shared
      |FROM sh a JOIN sh b ON a.s = b.s
      |WHERE a.doc_id >= 100 AND b.doc_id < 100
      |GROUP BY 1, 2""".stripMargin

  /** Character-level 40-gram substring dedup (Lee et al. ExactSubstr
    * flavor): doc pairs sharing any verbatim 40-char run, with the distinct
    * shared-gram count — catches boilerplate/quotation overlap that
    * token-shingle Jaccard dilutes. Exact-dup pre-pass + member expansion
    * keep the gram join linear (see `Dedup.charGramPairs`).
    */
  def substrDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.charGramPairs(docs(spark, dir), "doc_id", "text", gramLen = 40)

  /** Brute-force sliding-window char-gram join. */
  val substrDedupSql: String =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, length(text) - 39), i -> substr(text, i, 40)))) AS s
      |  FROM documents WHERE length(text) >= 40)
      |SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS n_shared
      |FROM g a JOIN g b ON a.s = b.s
      |WHERE a.doc_id < b.doc_id
      |GROUP BY 1, 2""".stripMargin

  /** Keep-one-per-cluster resolution: components of the MinHash near-dup
    * graph; `component` is the surviving doc_id for every clustered doc.
    * Runs over the linear-size cluster-edge set (representative pairs ∪
    * exact-dup membership edges) — identical components to CC over the fully
    * expanded pair set, without quadratic intermediate state.
    */
  /** Component labels of the MinHash near-dup graph — the "dedup manifest"
    * a real curation run materializes before deriving its views; both
    * `dedup_clusters` and `dedup_keep_best` re-read the one spill (see
    * `QueryMemo.spilled` for why a spill and not a cached/checkpointed
    * frame). Label frames are dup-graph-sized, not corpus-sized.
    */
  private def clusterLabels(spark: SparkSession, dir: String): DataFrame =
    QueryMemo.spilled(spark, dir, "minhash_cc")(
      Dedup.connectedComponents(
        Dedup.minHashLshClusterEdges(docs(spark, dir), "doc_id", "text",
          shingleN = 3, numHashes = 63, bands = 21, threshold = 0.8)))

  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterLabels(spark, dir)
      .select(col("node").as("doc_id"), col("component"))

  /** The recursive-CTE transitive closure over the brute-force near-dup
    * pair set — shared by BOTH cluster oracles so the definition of "a
    * cluster" (shingle size, threshold, closure algebra) lives in exactly
    * one place. Ends with `comp` = (doc_id, component = least reachable).
    */
  private val nearDupClosureCtes: String =
    """pairs AS (
      |  WITH sh AS (
      |    SELECT doc_id, unnest(list_distinct(
      |      CASE WHEN len(string_split(text, ' ')) >= 3
      |        THEN list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
      |          i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))
      |        ELSE [text] END)) AS s
      |    FROM documents),
      |  sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |  inter AS (
      |    SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      |    FROM sh a JOIN sh b ON a.s = b.s WHERE a.doc_id < b.doc_id
      |    GROUP BY a.doc_id, b.doc_id)
      |  SELECT ia, ib FROM inter
      |  JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
      |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
      |edges AS (SELECT ia AS a, ib AS b FROM pairs UNION SELECT ib, ia FROM pairs),
      |reach AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component
      |  FROM reach GROUP BY a)""".stripMargin

  /** Oracle: the shared closure, clustered docs only. */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE $nearDupClosureCtes
       |SELECT doc_id, component FROM comp""".stripMargin

  /** The full curation decision: near-dup clusters (MinHash graph) resolved
    * to one survivor each — the longest member (`n_chars`, ties to the
    * smallest doc_id). Every doc gets a row: `component` = its cluster label
    * (own id for singletons), `keep` = 1 iff it survives the dedup pass.
    */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame =
    Dedup.resolveKeepBest(docs(spark, dir), "doc_id", "n_chars",
        clusterLabels(spark, dir))
      .select(col("doc_id"), col("component"), col("keep"))

  /** Oracle: the shared closure, left-joined onto the full corpus,
    * survivor by the same exact ordering.
    */
  val dedupKeepBestSql: String =
    s"""WITH RECURSIVE $nearDupClosureCtes,
       |lab AS (
       |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component, d.n_chars
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
       |SELECT doc_id, component,
       |  CAST(CASE WHEN row_number() OVER (PARTITION BY component
       |      ORDER BY n_chars DESC, doc_id ASC) = 1 THEN 1 ELSE 0 END
       |    AS BIGINT) AS keep
       |FROM lab""".stripMargin

  /** Leakage-safe train/val/test split: the split hash is computed on each
    * doc's near-dup CLUSTER label (connected component of the MinHash
    * graph; own id for singletons), so near-duplicates always land on the
    * same side of the split. The plain `train_split` hash-of-own-id lets a
    * near-identical train/test pair leak eval content into training — the
    * contamination mode that inflates benchmark scores at corpus scale.
    * Same digest algebra as `train_split` (decorrelated digest chars drive
    * independent decisions). Scale: the label frame is dup-graph-sized and
    * left-joined onto the corpus (broadcast at any realistic dup rate);
    * the split itself is a shuffle-free projection.
    *
    * Stability contract: assignments are deterministic PER CORPUS SNAPSHOT.
    * A late-arriving near-duplicate can merge two clusters and change the
    * representative — legitimately moving members to the new rep's side
    * (keeping them together is the point). A pipeline that has already
    * SERVED eval examples must therefore pin the split at eval-freeze time
    * (persist this frame) rather than re-deriving it over a grown corpus.
    */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabels(spark, dir)
      .select(col("node").as("doc_id"), col("component"))
    val rep = coalesce(col("component"), col("doc_id"))
    val bucket = PipelineQueries.hashBucket(rep, 1, 100)
    docs(spark, dir).join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), rep.as("rep"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
          .as("split"))
  }

  /** Oracle: the shared near-dup closure, then the identical bucket CASE
    * over the representative instead of the doc's own id.
    */
  val leakageSafeSplitSql: String = {
    val b = PipelineQueries.hashBucketSql("rep", 1, 100)
    s"""WITH RECURSIVE $nearDupClosureCtes,
       |lab AS (
       |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
       |SELECT doc_id, rep,
       |  CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val'
       |    ELSE 'test' END AS split
       |FROM lab""".stripMargin
  }

  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(docs(spark, dir), "doc_id", "text", maxHamming = 3)

  /** Oracle replays the full SimHash pipeline in SQL — md5-nibble token
    * hashes, 60 per-bit vote sums, sign → signature — then scans ALL pairs.
    * The Spark side bands 4×15 bits, which is lossless for hamming ≤ 3, so
    * banded and all-pairs answers are identical.
    */
  val simhashPairsSql: String = {
    val nibCols = (0 until 15).map(d =>
      s"strpos('0123456789abcdef', substr(md5(t), ${d + 1}, 1)) - 1 AS n$d")
      .mkString(",\n    ")
    val voteCols = (0 until Dedup.SimHashBits).map(j =>
      s"sum(CASE WHEN ((n${j / 4} >> ${j % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n    ")
    val sigExpr = (0 until Dedup.SimHashBits)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |nib AS (
       |  SELECT doc_id,
       |    $nibCols
       |  FROM tok),
       |votes AS (
       |  SELECT doc_id,
       |    $voteCols
       |  FROM nib GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($sigExpr AS BIGINT) AS simhash FROM votes)
       |SELECT a.doc_id AS ia, b.doc_id AS ib,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
  }

  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Dedup.fingerprint(docs(spark, dir), "doc_id", "text")
      .select(col("__did").as("doc_id"), col("fingerprint"))

  /** Oracle: same 5-gram shingle set, min lowercase-hex md5 per doc. */
  val docFingerprintSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(string_split(text, ' ')) >= 5
      |      THEN list_transform(
      |        generate_series(1, len(string_split(text, ' ')) - 4),
      |        i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))
      |      ELSE [text] END)) AS s
      |  FROM documents)
      |SELECT doc_id, min(md5(s)) AS fingerprint FROM sh GROUP BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> (dedupClusters(_, _)),
    "dedup_keep_best" -> (dedupKeepBest(_, _)),
    "minhash_pairs" -> (minhashPairs(_, _)),
    "decontam_pairs" -> (decontamPairs(_, _)),
    "decontam_clean" -> (decontamClean(_, _)),
    "contam_ngrams" -> (contamNgrams(_, _)),
    "substr_dedup" -> (substrDedup(_, _)),
    "simhash_pairs" -> (simhashPairs(_, _)),
    "doc_fingerprint" -> (docFingerprint(_, _)),
    "leakage_safe_split" -> (leakageSafeSplit(_, _)))

  val oracles: Map[String, String] = Map(
    "dedup_clusters" -> dedupClustersSql,
    "dedup_keep_best" -> dedupKeepBestSql,
    "minhash_pairs" -> minhashPairsSql,
    "decontam_pairs" -> decontamPairsSql,
    "decontam_clean" -> decontamCleanSql,
    "contam_ngrams" -> contamNgramsSql,
    "substr_dedup" -> substrDedupSql,
    "simhash_pairs" -> simhashPairsSql,
    "doc_fingerprint" -> docFingerprintSql,
    "leakage_safe_split" -> leakageSafeSplitSql)
}
