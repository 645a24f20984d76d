package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis query pack over the `documents` table — the training-data
  * pipeline operators (token/char stats, regex token counting, language-ID
  * heuristic, quality scoring, exact dedup, n-gram Jaccard pairs, multimodal
  * binary plumbing).
  *
  * Oracle determinism: outputs are integers, strings, or ratios of exact
  * integers (single double division — bit-identical across engines).
  */
object TextQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  private def toks: Column = split(col("text"), " ")

  /** Per-document token/char statistics (whitespace tokenization). */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      col("n_chars"))

  val textStatsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  n_chars
      |FROM documents""".stripMargin

  /** Token counting: whitespace words + a BPE-ish regex segmentation
    * (letters / digits / single other-symbol runs).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_ws"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
        .cast("long").as("n_piece"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_piece
      |FROM documents""".stripMargin

  private val EnStop = Seq("the", "a", "of", "and", "to", "is", "in", "it")

  /** Language-ID heuristic: stopword-hit ratio over whitespace tokens
    * (n-gram/stopword heuristic family; deterministic, both-engine
    * expressible; a production pipeline swaps in a trained classifier).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val hits = size(filter(toks, t => t.isin(EnStop.map(lit(_)): _*))).cast("long")
    docs(spark, dir).select(
      col("doc_id"),
      hits.as("en_hits"),
      when(hits * 100 >= size(toks).cast("long") * 3, lit("en")).otherwise(lit("unk"))
        .as("pred_lang"))
  }

  val langIdSql: String = {
    val inList = EnStop.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, en_hits,
       |  CASE WHEN en_hits * 100 >= n_tokens * 3 THEN 'en' ELSE 'unk' END AS pred_lang
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($inList))) AS BIGINT) AS en_hits,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents) t""".stripMargin
  }

  /** Quality scoring: lexical-diversity ratio + length flags (the
    * length/punct/stopword-ratio family used to filter training corpora).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(toks).cast("long")
    val nDis = size(array_distinct(toks)).cast("long")
    docs(spark, dir).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      (nDis.cast("double") / nTok.cast("double")).as("diversity"),
      when(nTok < 10, 1L).otherwise(0L).as("too_short"),
      when(col("n_chars") > 1000, 1L).otherwise(0L).as("too_long"))
  }

  val qualityScoreSql: String =
    """SELECT doc_id, n_tokens,
      |  CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS diversity,
      |  CAST(CASE WHEN n_tokens < 10 THEN 1 ELSE 0 END AS BIGINT) AS too_short,
      |  CAST(CASE WHEN n_chars > 1000 THEN 1 ELSE 0 END AS BIGINT) AS too_long
      |FROM (
      |  SELECT doc_id, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      |  FROM documents) t""".stripMargin

  /** Per-source best-N curation: the 20 highest-lexical-diversity documents
    * of each source (ties → smallest doc_id) — the "keep the best of every
    * domain" selection step of a mixing pipeline. Scale: one shuffle on
    * source; the rank<=N filter plans as a WindowGroupLimit, so each map
    * task forwards at most N rows per source instead of sorting whole
    * partitions through the exchange.
    */
  /** Shared diversity ranking: (doc_id, source, diversity, rnk) with rnk =
    * per-source row_number by (diversity desc, doc_id asc) — ONE definition
    * of the ordering for both per-source curation queries, and one SQL
    * fragment mirroring it, so a tie-break or scoring change can't diverge
    * a query from its oracle by missing a copy.
    */
  private def diversityRanked(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(toks).cast("long")
    val nDis = size(array_distinct(toks)).cast("long")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("diversity").desc, col("doc_id").asc)
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        (nDis.cast("double") / nTok.cast("double")).as("diversity"))
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  private val diversityRankedSql: String =
    """SELECT doc_id, source, row_number() OVER (PARTITION BY source
      |      ORDER BY CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) DESC,
      |        doc_id ASC) AS rnk,
      |    count(*) OVER (PARTITION BY source) AS n_src
      |  FROM (
      |    SELECT doc_id, source,
      |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      |    FROM documents) t""".stripMargin

  def bestPerSource(spark: SparkSession, dir: String): DataFrame =
    diversityRanked(spark, dir)
      .filter(col("rnk") <= 20)
      .select(col("doc_id"), col("source"), col("rnk"))

  val bestPerSourceSql: String =
    s"""SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk FROM (
       |  $diversityRankedSql) r
       |WHERE rnk <= 20""".stripMargin

  /** Per-source top-quartile filter: keep each source's best 25% by lexical
    * diversity — proportional quality thresholding normalized WITHIN each
    * domain (a global cutoff would let one high-scoring source crowd out
    * every other, and a global rank needs a total sort; per-source windows
    * shuffle once on source and scale like any groupBy). Exact integer
    * algebra: rank*4 <= source count, no percentile interpolation to
    * diverge between engines.
    */
  def qualityQuartile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    diversityRanked(spark, dir)
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("rnk") * 4 <= col("n_src"))
      .select(col("doc_id"), col("source"), col("rnk"), col("n_src"))
  }

  val qualityQuartileSql: String =
    s"""SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk,
       |  CAST(n_src AS BIGINT) AS n_src
       |FROM (
       |  $diversityRankedSql) r
       |WHERE rnk * 4 <= n_src""".stripMargin

  /** Sliding-window chunking (64-token windows, stride 32): the
    * embedding-prep step that turns documents into overlapping passages
    * before encoding — overlap keeps boundary-straddling context retrievable.
    * Every chunk row carries (doc_id, chunk_id, chunk_text); the final
    * window is the natural remainder (never re-padded, so short docs emit
    * exactly one chunk). Scale: a pure per-row explode — no shuffle at all;
    * output rows ≈ n_tokens/stride per doc.
    */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    val n = size(toks)
    // NULL text emits no chunks, explicitly on BOTH sides: split(NULL)
    // would otherwise take the Spark side through greatest()/sequence()
    // into one null chunk while the oracle's generate_series(0, NULL, 32)
    // unnests to zero rows — a silent hash divergence. For non-null text
    // split() never returns an empty array, so n >= 1 and sequence's
    // bounds need no guard.
    docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("t"), n.as("n"))
      .withColumn("start",
        explode(sequence(lit(0), col("n") - 1, lit(32))))
      .select(col("doc_id"),
        (col("start") / 32).cast("long").as("chunk_id"),
        array_join(slice(col("t"), col("start") + 1,
          least(lit(64), col("n") - col("start"))), " ").as("chunk_text"))
  }

  val chunkOverlapSql: String =
    """SELECT doc_id, CAST(start // 32 AS BIGINT) AS chunk_id,
      |  array_to_string(t[start + 1 : least(start + 64, n)], ' ') AS chunk_text
      |FROM (
      |  SELECT doc_id, string_split(text, ' ') AS t,
      |    len(string_split(text, ' ')) AS n,
      |    unnest(generate_series(0, len(string_split(text, ' ')) - 1, 32)) AS start
      |  FROM documents WHERE text IS NOT NULL) d""".stripMargin

  /** Exact dedup (hash-groupBy): one surviving doc_id per distinct text.
    * Scale: group key is the text digest, not the text itself — the shuffle
    * carries 16 bytes + id per row regardless of document size.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** N-gram (unigram token-set) Jaccard near-dup pairs via explode + self-join
    * on shared tokens — the exact-verification stage of a MinHash pipeline
    * (restricted to doc_id < 200 to bound the oracle's pair space; the
    * MinHash/LSH variant in Dedup scales this to the full corpus).
    */
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), explode(array_distinct(toks)).as("w"))
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = tok.as("a").join(tok.as("b"), col("a.w") === col("b.w"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("ia"), col("n").as("na")), "ia")
      .join(sizes.select(col("doc_id").as("ib"), col("n").as("nb")), "ib")
      .withColumn("jacc",
        col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jacc") >= 0.9)
      .select(col("ia"), col("ib"))
  }

  val jaccardPairsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
      |  FROM documents WHERE doc_id < 200),
      |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      |  FROM tok a JOIN tok b ON a.w = b.w WHERE a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT ia, ib FROM inter
      |JOIN sizes sa ON sa.doc_id = ia
      |JOIN sizes sb ON sb.doc_id = ib
      |WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.9""".stripMargin

  /** Multimodal plumbing: treat the payload as an opaque binary column with
    * typed metadata (byte length + content digest). The decode/feature stage
    * for real image/audio bytes is the mapPartitions pipeline in
    * operators.Multimodal (stubbed decode, real plumbing).
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      md5(col("text").cast("binary")).as("digest"))

  val multimodalMetaSql: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS digest
      |FROM documents""".stripMargin

  /** Multimodal decode pipeline through the driver gate: text bytes stand in
    * for media payloads; the partition-batched decode adds fixed-dim
    * features, emitted as scalar FLOAT columns (hashable row shape). The stub
    * codec's md5-nibble features are exact dyadic rationals, so the DuckDB
    * oracle reproduces them bit-for-bit — the mapPartitions plumbing itself
    * is under the hash gate.
    */
  private val MediaDim = 8

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = docs(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val feat = graft.operators.Multimodal.decodeFeatures(media, "payload", dim = MediaDim)
    feat.select(col("doc_id") +:
      (0 until MediaDim).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
  }

  val mediaFeaturesSql: String = {
    val cols = (0 until MediaDim).map { i =>
      s"CAST((strpos('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1) / 16.0 - 0.5 AS FLOAT) AS f$i"
    }.mkString(",\n  ")
    s"""SELECT doc_id,
       |  $cols
       |FROM documents""".stripMargin
  }

  private val ImageDim = 24 // square synthetic PNGs

  /** REAL image decode through the pipeline with a FULL DuckDB hash gate:
    * deterministic synthetic PNGs (pixels integer-mixed from md5(doc_id))
    * are encoded with the own stored-block `PngEncoder` — byte-deterministic,
    * unlike ImageIO's writer — and then DECODED with pure-JDK ImageIO on
    * the executors: a FOREIGN decoder reading our bytes, through the same
    * mapPartitions plumbing as `media_features`, emitting
    * luminance-histogram stats. The oracle regenerates every pixel directly
    * from doc_id (the mix keeps only the seed's low 24 bits, which are
    * exactly md5-hex nibbles 3..8) and recomputes the histogram — any
    * defect in the PNG byte emission, the zlib framing, OR ImageIO's
    * read-back breaks the hash, the audio/video playbook applied to the
    * last rows-only row. MultimodalSpec keeps the analytic value-level gate
    * as the driver-independent twin.
    */
  def imageFeatures(spark: SparkSession, dir: String): DataFrame = {
    val withPng = graft.operators.Multimodal.withSyntheticPng(
      docs(spark, dir).select(col("doc_id")), "doc_id", "png",
      w = ImageDim, h = ImageDim)
    val feat = graft.operators.Multimodal.decodeFeatures(
      withPng, "png", dim = MediaDim,
      decoder = graft.operators.Multimodal.ImageIoDecoder)
    feat.select(col("doc_id") +:
      (0 until MediaDim).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
  }

  val imageFeaturesSql: String = {
    val total = ImageDim * ImageDim
    val cols = (0 until MediaDim).map { i =>
      s"CAST(SUM(CASE WHEN bucket = $i THEN 1 ELSE 0 END) / $total.0 AS FLOAT) AS f$i"
    }.mkString(",\n  ")
    // seed low 24 bits = md5 hex nibbles 3..8 (big-endian first-int read)
    val s24 = (0 until 6).map { k =>
      s"(strpos('0123456789abcdef', substr(hx, ${3 + k}, 1)) - 1) * ${1L << (4 * (5 - k))}"
    }.mkString(" + ")
    s"""WITH px AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx, y.y, x.x
       |            FROM documents,
       |                 (SELECT unnest(range(0, $ImageDim)) AS y) y,
       |                 (SELECT unnest(range(0, $ImageDim)) AS x) x),
       |m AS (SELECT doc_id,
       |        xor(xor((x * 73856093) % 16777216, (y * 19349663) % 16777216),
       |            $s24) AS rgb
       |      FROM px),
       |l AS (SELECT doc_id,
       |        ((rgb // 65536) * 299 + ((rgb // 256) % 256) * 587 + (rgb % 256) * 114) // 1000 AS lum
       |      FROM m),
       |b AS (SELECT doc_id, least(${MediaDim - 1}, lum * $MediaDim // 256) AS bucket FROM l)
       |SELECT doc_id,
       |  $cols
       |FROM b GROUP BY doc_id""".stripMargin
  }

  private val AudioSamples = 2048

  /** REAL audio decode through the pipeline with a FULL DuckDB hash gate:
    * deterministic synthetic PCM16 WAVs (samples an exact integer function
    * of doc_id — see `Multimodal.withSyntheticWav`) are container-ENCODED
    * and then RIFF-parse-DECODED on the executors, emitting an
    * absolute-amplitude histogram. The oracle regenerates the samples
    * directly from doc_id (no WAV bytes) and recomputes the histogram —
    * any encode OR parse defect breaks the hash, so unlike `image_features`
    * (PNG emitter bytes unpinned) this real-codec path is hash-gated
    * end-to-end. Shares are k/2048 with k ≤ 2048 — exact in float, no
    * rounding anywhere.
    */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    val withWav = graft.operators.Multimodal.withSyntheticWav(
      docs(spark, dir).select(col("doc_id")), "doc_id", "wav",
      nSamples = AudioSamples)
    val feat = graft.operators.Multimodal.decodeFeatures(
      withWav, "wav", dim = MediaDim,
      decoder = graft.operators.Multimodal.WavPcmDecoder)
    feat.select(col("doc_id") +:
      (0 until MediaDim).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
  }

  val audioFeaturesSql: String = {
    val cols = (0 until MediaDim).map { i =>
      s"CAST(SUM(CASE WHEN bucket = $i THEN 1 ELSE 0 END) / $AudioSamples.0 AS FLOAT) AS f$i"
    }.mkString(",\n  ")
    s"""WITH s AS (SELECT doc_id,
       |             ((doc_id * 2654435761 + t.t * 40503) % 65536) - 32768 AS v
       |           FROM documents, (SELECT unnest(range(0, $AudioSamples)) AS t) t),
       |b AS (SELECT doc_id, least(${MediaDim - 1}, (abs(v) * $MediaDim) // 32768) AS bucket FROM s)
       |SELECT doc_id,
       |  $cols
       |FROM b GROUP BY doc_id""".stripMargin
  }

  private val VideoFrames = 4
  private val VideoDim = 16 // square frames

  /** REAL video decode with the same FULL hash gate as audio: deterministic
    * synthetic uncompressed-DIB AVIs (pixels an exact integer function of
    * (doc_id, frame, x, y) — `Multimodal.withSyntheticAvi`) are
    * container-ENCODED and RIFF-walk-DECODED on executors, emitting an
    * inter-frame MOTION histogram (per-pixel |Δluminance| between
    * consecutive frames). The oracle regenerates every pixel pair directly
    * from doc_id and recomputes the histogram — any header, row-padding,
    * bottom-up-order, or channel-order defect in encode OR decode breaks
    * the hash.
    */
  def videoFeatures(spark: SparkSession, dir: String): DataFrame = {
    val withAvi = graft.operators.Multimodal.withSyntheticAvi(
      docs(spark, dir).select(col("doc_id")), "doc_id", "avi",
      w = VideoDim, h = VideoDim, nFrames = VideoFrames)
    val feat = graft.operators.Multimodal.decodeFeatures(
      withAvi, "avi", dim = MediaDim,
      decoder = graft.operators.Multimodal.AviDibDecoder)
    feat.select(col("doc_id") +:
      (0 until MediaDim).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
  }

  val videoFeaturesSql: String = {
    val total = (VideoFrames - 1) * VideoDim * VideoDim
    val cols = (0 until MediaDim).map { i =>
      s"CAST(SUM(CASE WHEN bucket = $i THEN 1 ELSE 0 END) / $total.0 AS FLOAT) AS f$i"
    }.mkString(",\n  ")
    s"""WITH px AS (SELECT doc_id, f.f, y.y, x.x
       |            FROM documents,
       |                 (SELECT unnest(range(0, ${VideoFrames - 1})) AS f) f,
       |                 (SELECT unnest(range(0, $VideoDim)) AS y) y,
       |                 (SELECT unnest(range(0, $VideoDim)) AS x) x),
       |m AS (SELECT doc_id,
       |        ((doc_id*2654435761 + f*69427 + y*19349663 + x*73856093) % 16777216) AS m0,
       |        ((doc_id*2654435761 + (f+1)*69427 + y*19349663 + x*73856093) % 16777216) AS m1
       |      FROM px),
       |l AS (SELECT doc_id,
       |        ((m0 // 65536) * 299 + ((m0 // 256) % 256) * 587 + (m0 % 256) * 114) // 1000 AS l0,
       |        ((m1 // 65536) * 299 + ((m1 // 256) % 256) * 587 + (m1 % 256) * 114) // 1000 AS l1
       |      FROM m),
       |b AS (SELECT doc_id, least(${MediaDim - 1}, abs(l1 - l0) * $MediaDim // 256) AS bucket FROM l)
       |SELECT doc_id,
       |  $cols
       |FROM b GROUP BY doc_id""".stripMargin
  }

  /** Corpus vocabulary statistics: the top-50 word bigrams by document
    * frequency (ties broken lexicographically) — the frequency-table shape
    * of vocabulary building / corpus profiling. Scale: explode + one
    * map-side-combined count on the bigram key, then a global top-k
    * (TakeOrderedAndProject, no full sort).
    */
  def topNgrams(spark: SparkSession, dir: String): DataFrame = {
    val grams = graft.functions.vfn.ngrams(toks, 2)
    docs(spark, dir)
      .filter(size(toks) >= 2)
      .select(col("doc_id"), explode(array_distinct(grams)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("bigram").asc)
      .limit(50)
  }

  val topNgramsSql: String =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(string_split(text, ' ')) - 1),
      |    i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')))) AS bigram
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2)
      |SELECT bigram, count(DISTINCT doc_id) AS df
      |FROM g GROUP BY bigram
      |ORDER BY df DESC, bigram ASC
      |LIMIT 50""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "top_ngrams" -> (topNgrams(_, _)),
    "media_features" -> (mediaFeatures(_, _)),
    "image_features" -> (imageFeatures(_, _)),
    "audio_features" -> (audioFeatures(_, _)),
    "video_features" -> (videoFeatures(_, _)),
    "text_stats" -> (textStats(_, _)),
    "token_count" -> (tokenCount(_, _)),
    "lang_id" -> (langId(_, _)),
    "quality_score" -> (qualityScore(_, _)),
    "best_per_source" -> (bestPerSource(_, _)),
    "quality_quartile" -> (qualityQuartile(_, _)),
    "chunk_overlap" -> (chunkOverlap(_, _)),
    "dedup_exact" -> (dedupExact(_, _)),
    "jaccard_pairs" -> (jaccardPairs(_, _)),
    "multimodal_meta" -> (multimodalMeta(_, _)))

  val oracles: Map[String, String] = Map(
    "top_ngrams" -> topNgramsSql,
    "text_stats" -> textStatsSql,
    "token_count" -> tokenCountSql,
    "lang_id" -> langIdSql,
    "quality_score" -> qualityScoreSql,
    "best_per_source" -> bestPerSourceSql,
    "quality_quartile" -> qualityQuartileSql,
    "chunk_overlap" -> chunkOverlapSql,
    "dedup_exact" -> dedupExactSql,
    "jaccard_pairs" -> jaccardPairsSql,
    "multimodal_meta" -> multimodalMetaSql,
    "media_features" -> mediaFeaturesSql,
    "image_features" -> imageFeaturesSql,
    "audio_features" -> audioFeaturesSql,
    "video_features" -> videoFeaturesSql)
}
