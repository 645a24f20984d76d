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
    require(n > 0, s"gram length must be positive, got $n")
    require(minDf >= 2, s"minDf < 2 would mark every gram boilerplate, got $minDf")
    val toks = split(col(textCol), " ")
    val base = docs.select(col(idCol), col(groupCol).as("__grp"),
      size(toks).cast("long").as("n_tok"), toks.as("__w"))
    val occ = base.select(col(idCol), col("__grp"),
      posexplode(graft.functions.vfn.ngrams(col("__w"), n))).toDF(
      idCol, "__grp", "__pos", "__gram")
    val boiler = occ.select(idCol, "__grp", "__gram").distinct()
      .groupBy(col("__grp"), col("__gram")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf).select("__grp", "__gram")
    val covered = occ.join(boiler, Seq("__grp", "__gram"))
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + (n - 1))).as("__p"))
      .distinct()
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_covered"))
    base.select(idCol, "n_tok").join(covered, Seq(idCol), "left")
      .withColumn("n_covered", coalesce(col("n_covered"), lit(0L)))
      .withColumn("coverage", col("n_covered").cast("double") / col("n_tok"))
  }
}
