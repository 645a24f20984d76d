package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram containment decontamination with a broadcast Bloom
  * pre-filter — the GPT-3/PaLM-style "training doc shares a long n-gram
  * with a held-out benchmark" scan, structured for the 100 TB shape where
  * the corpus is enormous and the benchmark side is comparatively tiny.
  *
  * Plan: (1) build one Bloom filter over the DISTINCT benchmark n-grams
  * (distributed partial build via `stat.bloomFilter`'s treeAggregate; the
  * merged filter is megabytes); (2) stream the corpus grams through the
  * codegen `bloom_might_contain` kernel — the ~100% of grams that cannot
  * match any benchmark gram die in the scan stage and NEVER REACH THE
  * SHUFFLE, which is the entire point: without the filter, the gram
  * equi-join shuffles the full corpus gram set (≫ corpus bytes after
  * explode); (3) exact equi-join + pair count over the survivors, which
  * also eliminates the Bloom's false positives — the result is EXACT, the
  * filter only prunes.
  *
  * Bloom sizing: `expectedEvalGrams` under-estimation only raises the
  * false-positive rate (more verify work, same answer) — never drops a
  * pair, because an inserted value always probes true.
  */
object Decontam {

  /** Pairs (ia = corpus id, ib = eval id, n_shared = count of distinct
    * shared word n-grams) for every corpus doc sharing at least one n-gram
    * with an eval doc. Docs shorter than n tokens contribute their whole
    * text as a single gram (same fallback as `Dedup.shingles`).
    */
  def ngramContamination(corpus: DataFrame, corpusId: String, corpusText: String,
      eval: DataFrame, evalId: String, evalText: String, n: Int,
      expectedEvalGrams: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val evalGrams = Dedup.shingles(eval, evalId, evalText, n)
      .select(col("__did").as("__eid"), col("s"))
    val bloomBytes = org.apache.spark.sql.graft.BloomMightContain.serialize(
      evalGrams.stat.bloomFilter("s", expectedEvalGrams, fpp))
    val corpusGrams = Dedup.shingles(corpus, corpusId, corpusText, n)
      .filter(graft.functions.vfn.bloomMightContain(col("s"), bloomBytes))
    corpusGrams.join(evalGrams, "s")
      .groupBy(col("__did").as("ia"), col("__eid").as("ib"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
