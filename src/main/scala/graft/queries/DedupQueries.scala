package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

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

  /** Keep-one-per-cluster resolution: components of the MinHash near-dup
    * graph; `component` is the surviving doc_id for every clustered doc.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(minhashPairs(spark, dir))
      .select(col("node").as("doc_id"), col("component"))

  /** Oracle: transitive closure by recursive CTE over the brute-force pair
    * set, component = least reachable id.
    */
  val dedupClustersSql: String =
    """WITH RECURSIVE pairs AS (
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
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
      |SELECT a AS doc_id, least(a, min(b)) AS component
      |FROM reach GROUP BY a""".stripMargin

  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(docs(spark, dir), "doc_id", "text", maxHamming = 3)

  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Dedup.fingerprint(docs(spark, dir), "doc_id", "text")
      .select(col("__did").as("doc_id"), col("fingerprint"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> (dedupClusters(_, _)),
    "minhash_pairs" -> (minhashPairs(_, _)),
    "simhash_pairs" -> (simhashPairs(_, _)),
    "doc_fingerprint" -> (docFingerprint(_, _)))

  val oracles: Map[String, String] = Map(
    "dedup_clusters" -> dedupClustersSql,
    "minhash_pairs" -> minhashPairsSql)
}
