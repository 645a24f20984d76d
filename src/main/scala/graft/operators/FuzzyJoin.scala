package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — the fuzzy string matching operator a
  * data-cleaning / entity-resolution pipeline runs over name columns and
  * vocabularies (typo clustering, near-identical record linkage). Pairs all
  * strings within Levenshtein distance `k` WITHOUT an n² comparison, via
  * partition-chunk signatures (the PassJoin construction, Li et al.,
  * ICDE'11 — public literature):
  *
  *   - build role: each string of length L is split into k+1 contiguous
  *     chunks (even partition). If two strings are within edit distance k,
  *     at most k of those chunks are touched by edits, so AT LEAST ONE
  *     chunk of the build string survives verbatim inside the probe string,
  *     shifted by at most k positions (each preceding insert/delete shifts
  *     it by one).
  *   - probe role: each string emits, for every plausible build length
  *     l ∈ [L-k, L+k] and chunk index i, its substrings at the chunk's
  *     position ± k. That is ≤ (2k+1)·(k+1)·(2k+1) short substrings per
  *     string — constant for fixed k (45 at k=2), not O(L).
  *
  * The equi-join on (build-length, chunk-index, substring) yields a
  * candidate superset with NO false negatives (the pigeonhole above), and
  * an exact banded Levenshtein pass keeps true pairs only. Strings of
  * length ≤ k fall into a single shared short-bucket signature paired with
  * probe strings of length ≤ 2k — the only place the blocking degrades to
  * cross-product, and it is capped by the (tiny) population of near-empty
  * strings.
  *
  * Scale: dedupe-to-distinct first (callers join counts back), then one
  * explode to ~45 signature rows per distinct string, one equi-join on a
  * high-cardinality composite key (well-distributed — chunk content), one
  * distinct, one verify filter. All per-row work is O(k²) substrings and
  * one O(k·|s|) threshold Levenshtein; nothing is ever collected to the
  * driver and no step is quadratic in the corpus.
  */
object FuzzyJoin {

  /** All unordered pairs of distinct values of `strCol` within Levenshtein
    * distance `k` (1 ≤ k ≤ 9). Output columns: `a`, `b` (binary-ordered,
    * a < b), `dist` (exact distance, IntegerType). Input rows are
    * deduplicated; null strings are dropped.
    *
    * `maxSigBucket` (opt-in): drop signature buckets with more than that
    * many BUILD members before the candidate join — the same adversarial
    * defense as the LSH pipelines' bucket cap. A boilerplate chunk shared
    * by 10⁶ strings (every string starting "https://www.", say) makes the
    * candidate set quadratic in that group; capping trades those
    * candidates away EXPLICITLY (warn-logged through `Dedup.capBuckets`'
    * observed-metric listener) instead of letting one hot chunk own the
    * job. A pair is
    * only lost if ALL of its shared chunks are over-cap — unlike LSH this
    * blocking is complete, so with the cap off (default) results are
    * exact.
    */
  def editDistanceSelfJoin(df: DataFrame, strCol: String, k: Int,
      maxSigBucket: Option[Int] = None): DataFrame = {
    require(k >= 1 && k <= 9, s"k must be in [1, 9], got $k")
    require(maxSigBucket.forall(_ >= 1), s"maxSigBucket must be >= 1")
    val strs = df.select(col(strCol).as("s")).filter(col("s").isNotNull).distinct()
    val buildAll = strs.select(col("s"), explode(buildSigs("s", k)).as("sig"))
      .select(col("s"), col("sig.l"), col("sig.i"), col("sig.sub"))
    // shared with the LSH pipelines: window count + uniquely-named observe
    // + filter, with the registered listener that actually LOGS drops —
    // the earlier local reimplementation observed a metric nothing read
    val build = maxSigBucket.fold(buildAll)(cap =>
      Dedup.capBuckets(buildAll, Seq("l", "i", "sub"), cap))
    val probe = strs.select(col("s").as("t"))
      .select(col("t"), explode(probeSigs("t", k)).as("sig"))
      .select(col("t"), col("sig.l"), col("sig.i"), col("sig.sub"))
    val cands = build.join(probe, Seq("l", "i", "sub"))
      .filter(col("s") =!= col("t"))
      .select(least(col("s"), col("t")).as("a"), greatest(col("s"), col("t")).as("b"))
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("a"), col("b"), k))
      .filter(col("dist") >= 0) // threshold form returns -1 past the band
  }

  // Even partition of length l into k+1 chunks: base = l div (k+1),
  // rem = l % (k+1); the FIRST (k+1-rem) chunks take `base` chars, the rest
  // base+1. start(l,i) = i*base + max(0, i-(k+1-rem)). Both roles must
  // compute the identical scheme — keep these two expressions in sync.
  private def startExpr(l: String, i: String, k: Int): String = {
    val k1 = k + 1
    s"($i * ($l div $k1) + greatest(0, $i - ($k1 - $l % $k1)))"
  }
  private def clenExpr(l: String, i: String, k: Int): String = {
    val k1 = k + 1
    s"(($l div $k1) + if($i >= $k1 - $l % $k1, 1, 0))"
  }

  /** Build-role signatures: the string's own k+1 chunks keyed by
    * (own length, chunk index); strings of length ≤ k emit the shared
    * short-bucket signature (l = -1).
    */
  private def buildSigs(c: String, k: Int) = expr({
    val st = startExpr(s"length($c)", "i", k)
    val cl = clenExpr(s"length($c)", "i", k)
    s"""case when length($c) <= $k
       |  then array(named_struct('l', -1, 'i', 0, 'sub', ''))
       |  else transform(sequence(0, $k), i -> named_struct(
       |    'l', length($c), 'i', i,
       |    'sub', substring($c, $st + 1, $cl)))
       |end""".stripMargin
  })

  /** Probe-role signatures: for each plausible build length l and chunk i,
    * the probe's substrings at the chunk position shifted by -k..k (clipped
    * to the string); plus the short bucket when length ≤ 2k. Deduplicated —
    * shifts often alias at chunk boundaries.
    *
    * l ranges over [length-k, length] only (NOT length+k): in any pair the
    * NOT-SHORTER string can serve as probe, so partitioning only the
    * shorter side keeps the pigeonhole complete while halving signature
    * volume and candidate-join output — each qualifying pair is generated
    * in one orientation instead of two. Strings of length ≤ k never need
    * long-probe signatures: any partner within distance k is then ≤ 2k,
    * and both sides meet in the short bucket.
    */
  private def probeSigs(c: String, k: Int) = expr({
    val k1 = k + 1
    val st = startExpr("l", "i", k)
    val cl = clenExpr("l", "i", k)
    s"""array_distinct(concat(
       |  filter(array(named_struct('l', -1, 'i', 0, 'sub', '')),
       |         x -> length($c) <= ${2 * k}),
       |  if(length($c) >= $k1,
       |    flatten(transform(
       |      sequence(greatest($k1, length($c) - $k), length($c)), l ->
       |        flatten(transform(sequence(0, $k), i ->
       |          filter(
       |            transform(sequence(-$k, $k), sh -> named_struct(
       |              'l', l, 'i', i,
       |              'sub', if($st + sh >= 0 and $st + sh + $cl <= length($c),
       |                        substring($c, $st + sh + 1, $cl),
       |                        cast(null as string)))),
       |            x -> x.sub is not null))))),
       |    filter(array(named_struct('l', -1, 'i', 0, 'sub', '')), x -> false))
       |))""".stripMargin
  })
}
