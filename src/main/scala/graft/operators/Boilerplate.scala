package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate detection: which token positions of a document
  * are covered by word n-grams repeated across ≥ minDf DISTINCT documents of
  * the same group (source/domain) — the per-domain template detector of the
  * CCNet / Dolma curation recipes (site headers, footers, nav text repeat
  * across a domain's pages; prose doesn't). The query-pack entry
  * (`boilerplate_coverage`) delegates here; ScaleBench times this core on
  * the replicated corpus.
  *
  * Scale: the df pass is a (group, gram)-keyed count over per-doc DISTINCT
  * grams — map-side combinable, the TF-IDF shuffle shape. The coverage join
  * is gram-equi against the boilerplate subset (df ≥ minDf prunes it to a
  * sliver of the gram space), and the position expansion is bounded by n×
  * the matched occurrences. No all-pairs stage; linear in the corpus.
  */
object Boilerplate {

  /** Shared detection stages: the tokenized base frame, the positional gram
    * occurrences, and the per-doc DISTINCT covered positions (exploded from
    * boilerplate-gram occurrences).
    */
  private def coveredPositions(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      n: Int, minDf: Int): (DataFrame, DataFrame) = {
    require(n > 0, s"gram length must be positive, got $n")
    require(minDf >= 2, s"minDf < 2 would mark every gram boilerplate, got $minDf")
    val toks = split(col(textCol), " ")
    val base = docs.select(col(idCol), col(groupCol).as("__grp"),
      size(toks).cast("long").as("n_tok"), toks.as("__w"))
    val occ = base.select(col(idCol), col("__grp"),
      posexplode(graft.functions.vfn.ngrams(col("__w"), n))).toDF(
      idCol, "__grp", "__pos", "__gram")
    // df pass: each doc's grams dedup IN-ROW (array_distinct) before the
    // explode, so one (grp, gram) row per (doc, gram) reaches the count —
    // identical distinct-doc counts to a distinct() over the occurrence
    // stream, but the corpus-scale distinct EXCHANGE disappears and the
    // remaining (grp, gram) aggregation combines map-side (guide §2.3/2.4:
    // one less full-stream shuffle; the doc id never enters the exchange)
    val boiler = base.select(col("__grp"),
        explode(array_distinct(graft.functions.vfn.ngrams(col("__w"), n)))
          .as("__gram"))
      .groupBy(col("__grp"), col("__gram")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf).select("__grp", "__gram")
    val covered = occ.join(boiler, Seq("__grp", "__gram"))
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + (n - 1))).as("__p"))
      .distinct()
    (base, covered)
  }

  /** Per-document coverage: (idCol, n_tok, n_covered, coverage) — coverage
    * is ONE exact double division of integers (hash-gate safe). Every input
    * document appears exactly once (zero-coverage docs included).
    */
  def coverage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      n: Int = 3,
      minDf: Int = 2): DataFrame = {
    val (base, covered) = coveredPositions(docs, idCol, textCol, groupCol, n, minDf)
    val counts = covered.groupBy(col(idCol)).agg(count(lit(1)).as("n_covered"))
    base.select(idCol, "n_tok").join(counts, Seq(idCol), "left")
      .withColumn("n_covered", coalesce(col("n_covered"), lit(0L)))
      .withColumn("coverage", col("n_covered").cast("double") / col("n_tok"))
  }

  /** Paragraph-aware variants: real corpora carry line structure, and the
    * CCNet/Dolma template pass runs per paragraph — grams must never
    * straddle a newline (a header's last words + body's first words is not
    * a template), and the scrub must give the newline structure back. The
    * detection unit stays the DOCUMENT (a gram is boilerplate when it
    * appears in ≥ minDf distinct docs of the group, wherever in their
    * paragraphs), only gram CONSTRUCTION is paragraph-local. Same shuffle
    * shape as the flat pass — one (group, gram) df aggregate, one
    * occurrences-only equi-join — plus one per-doc reassembly groupBy in
    * the scrub (bounded: one row per paragraph, not per token).
    */
  private def paraCoveredPositions(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      n: Int, minDf: Int, sep: String): (DataFrame, DataFrame) = {
    require(n > 0, s"gram length must be positive, got $n")
    require(minDf >= 2, s"minDf < 2 would mark every gram boilerplate, got $minDf")
    // Pattern.quote: Spark's split takes a REGEX, but `sep` is a LITERAL
    // separator by contract (the scrub reassembles with the same string,
    // and the DuckDB twin string_splits literally) — an unquoted "." or
    // "|" would shred the text into per-character paragraphs silently
    val paras = docs.select(col(idCol), col(groupCol).as("__grp"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF(idCol, "__grp", "__pi", "__pt")
    val toks = split(col("__pt"), " ")
    val base = paras.select(col(idCol), col("__grp"), col("__pi"),
      size(toks).cast("long").as("__nt"), toks.as("__w"))
    val occ = base.select(col(idCol), col("__grp"), col("__pi"),
      posexplode(graft.functions.vfn.ngrams(col("__w"), n))).toDF(
      idCol, "__grp", "__pi", "__pos", "__gram")
    // df pass straight from the documents: per-paragraph gram arrays flatten
    // per DOC and dedup in-row, so one (grp, gram) row per (doc, gram)
    // reaches the count — the same distinct-doc counts as a distinct() over
    // the per-paragraph occurrence stream (a gram repeated across a doc's
    // paragraphs still counts once), without the corpus-scale distinct
    // exchange; the (grp, gram) aggregation combines map-side. Grams still
    // never straddle `sep` — construction stays paragraph-local.
    val docGrams = docs.select(col(groupCol).as("__grp"),
      explode(array_distinct(flatten(transform(
        split(col(textCol), java.util.regex.Pattern.quote(sep)),
        p => graft.functions.vfn.ngrams(split(p, " "), n))))).as("__gram"))
    val boiler = docGrams
      .groupBy(col("__grp"), col("__gram")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf).select("__grp", "__gram")
    val covered = occ.join(boiler, Seq("__grp", "__gram"))
      .select(col(idCol), col("__pi"),
        explode(sequence(col("__pos"), col("__pos") + (n - 1))).as("__p"))
      .distinct()
    (base, covered)
  }

  /** Per-document coverage over a multi-line corpus: token totals and
    * covered counts sum over paragraphs; n-grams never straddle `sep`.
    * Output schema matches `coverage`: (idCol, n_tok, n_covered, coverage).
    */
  def paraCoverage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      n: Int = 3,
      minDf: Int = 2,
      sep: String = "\n"): DataFrame = {
    val (base, covered) = paraCoveredPositions(docs, idCol, textCol, groupCol, n, minDf, sep)
    val nTok = base.groupBy(col(idCol)).agg(sum(col("__nt")).as("n_tok"))
    val counts = covered.groupBy(col(idCol)).agg(count(lit(1)).as("n_covered"))
    nTok.join(counts, Seq(idCol), "left")
      .withColumn("n_covered", coalesce(col("n_covered"), lit(0L)))
      .withColumn("coverage", col("n_covered").cast("double") / col("n_tok"))
  }

  /** Paragraph-preserving scrub: each paragraph rebuilds in-row from its
    * uncovered positions (the same hash-set `array_except` rebuild as
    * `scrub`), then the document reassembles with `sep` in paragraph order
    * — a fully-templated paragraph comes back as an empty line, never
    * dropped, so the line structure of the clean text mirrors the input.
    * Output: (idCol, clean_text, n_kept).
    */
  def paraScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      n: Int = 3,
      minDf: Int = 2,
      sep: String = "\n"): DataFrame = {
    val (base, covered) = paraCoveredPositions(docs, idCol, textCol, groupCol, n, minDf, sep)
    val covArr = covered.groupBy(col(idCol), col("__pi"))
      .agg(sort_array(collect_list(col("__p"))).as("__cov"))
    val keptPos = array_except(
      sequence(lit(0), (col("__nt") - 1).cast("int")), col("__cov"))
    val cleanPara = base.join(covArr, Seq(idCol, "__pi"), "left")
      .select(col(idCol), col("__pi"),
        when(col("__cov").isNull, array_join(col("__w"), " "))
          .otherwise(array_join(
            transform(keptPos, p => element_at(col("__w"), p + 1)), " "))
          .as("__ct"),
        (col("__nt") - coalesce(size(col("__cov")), lit(0)).cast("long"))
          .as("__nk"))
    cleanPara.groupBy(col(idCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("__pi"), col("__ct")))),
          s => s.getField("__ct")), sep).as("clean_text"),
        sum(col("__nk")).as("n_kept"))
  }

  /** The REMOVAL transform over the same detection: rebuild each document
    * from its uncovered token positions — (idCol, clean_text, n_kept).
    * The rebuild is IN-ROW: the per-doc covered positions aggregate to one
    * (small) array, join back to the tokenized base on the doc key, and a
    * higher-order `filter` drops covered indices — so the only shuffled
    * stream is the boilerplate OCCURRENCES (a sliver at real dup rates),
    * never the corpus token stream. Order is trivially preserved (tokens
    * never leave their row); a fully-templated document comes back as the
    * empty string, never dropped. The passage analog is
    * `Dedup.passageScrub` (whole repeated passages); this cuts per-domain
    * templated SPANS while keeping the prose around them.
    */
  def scrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      n: Int = 3,
      minDf: Int = 2): DataFrame = {
    val (base, covered) = coveredPositions(docs, idCol, textCol, groupCol, n, minDf)
    // covered is DISTINCT (id, pos): the array is duplicate-free by
    // construction and bounded by the doc's own length
    val covArr = covered.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__p"))).as("__cov"))
    // kept positions = sequence(0, n_tok-1) MINUS covered. array_except
    // builds a hash set of the right-hand array, so the rebuild is
    // O(n_tok + |covered|) per row — the earlier per-token array_contains
    // scan was O(n_tok × |covered|), quadratic on fully-templated long docs.
    // array_except preserves left order and positions are unique, so the
    // reconstructed text is bit-identical to the filter form.
    val keptPos = array_except(
      sequence(lit(0), (col("n_tok") - 1).cast("int")), col("__cov"))
    base.join(covArr, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__cov").isNull, array_join(col("__w"), " "))
          .otherwise(array_join(
            transform(keptPos, p => element_at(col("__w"), p + 1)), " "))
          .as("clean_text"),
        (col("n_tok") - coalesce(size(col("__cov")), lit(0)).cast("long"))
          .as("n_kept"))
  }
}
