package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + encoding — the tokenizer-fitting
  * step of a training-data pipeline (Sennrich et al. 2016, arXiv:1508.07909;
  * the GPT-2 BPE encoder and sentencepiece are the public practice
  * references). No reference-engine counterpart (like `Matryoshka` /
  * `Boilerplate`, part of the beyond-reference curation surface).
  *
  * Scale shape — the part that matters at 100 TB: BPE trains on WORD-TYPE
  * frequencies, not the token stream. One map-side-combinable `groupBy`
  * collapses the corpus to its word-type table (Heaps'-law sublinear in
  * corpus size), and every merge iteration runs over that bounded table;
  * the corpus itself is scanned exactly once. For unbounded vocabularies
  * the documented public recipe is frequency truncation — train on the
  * top-`maxWordTypes` types (what sentencepiece's trainer does with its
  * sentence/seed caps); the tail it drops holds, by construction, the
  * least pair mass. Encoding likewise touches each DISTINCT word once
  * (executor-side greedy merge over the type table) and reaches the corpus
  * through a broadcast join — two corpus passes total, zero per-merge
  * corpus passes.
  *
  * Determinism contract (what the DuckDB oracle replays): each round's
  * merge is the adjacent symbol pair with the highest frequency-weighted
  * count, ties broken by (lsym ASC, rsym ASC) in binary string order. The
  * per-round word-table states ride the aux channel, so the oracle
  * independently recounts pairs from each state and re-derives every merge
  * decision; the state TRANSITION (leftmost-first non-overlapping
  * replacement) is gated by `BpeSpec` against an independent naive
  * implementation.
  *
  * Two seed alphabets:
  *  - `byteLevel = false`: symbols are UTF-16 chars — BMP-only corpora, and
  *    now LOUDLY so (a word containing surrogate pairs fails with a pointer
  *    to the byte-level path; silently splitting surrogates would emit
  *    garbage symbols AND put the Spark/DuckDB string tie-breaks at odds).
  *  - `byteLevel = true`: symbols seed from the word's UTF-8 bytes through
  *    GPT-2's byte↔printable-unicode bijection (`byteToChar`), the
  *    production recipe for arbitrary text — emoji, CJK extensions, any
  *    UTF-8 — with exact `decode` round-trip. Every mapped symbol is a BMP
  *    char < U+0144, so byte-level strings flow through the identical
  *    string machinery and keep Java compareTo ≡ UTF-8 binary order (the
  *    oracle's tie-break comparator).
  */
object Bpe {

  /** Classic end-of-word marker (Sennrich): makes "low" the word-final
    * token distinct from "low" inside "lower".
    */
  val EndOfWord = "</w>"

  /** GPT-2's byte→printable-unicode bijection (encoder.py
    * `bytes_to_unicode`, public): the 188 visibly-printable Latin-1 bytes
    * map to themselves; the remaining 68 (controls, space, DEL, 0xA0, 0xAD)
    * map to U+0100.. in byte order. Image ⊂ [U+0021, U+0143] — all BMP, no
    * surrogates, UTF-8 byte order ≡ code-point order ≡ Java compareTo.
    */
  val byteToChar: Array[Char] = {
    val self = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
      .map(_.toInt).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (self(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  private val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Inverse of the byte-level symbol encoding: mapped-char token string →
    * original UTF-8 text (EndOfWord markers dropped). Exact round-trip on
    * any input — the property `BpeSpec` gates on emoji/multi-byte text.
    */
  def decodeByteSyms(syms: Seq[String]): String = {
    val bytes = mutable.ArrayBuilder.make[Byte]
    for (s <- syms; piece = if (s.endsWith(EndOfWord)) s.dropRight(EndOfWord.length) else s;
         c <- piece)
      bytes += charToByte.getOrElse(c,
        throw new IllegalArgumentException(s"not a byte-level symbol char: U+${c.toInt.toHexString}")).toByte
    new String(bytes.result(), java.nio.charset.StandardCharsets.UTF_8)
  }

  final case class Merge(rank: Int, lsym: String, rsym: String)

  /** One row of an exported training state: the symbol sequence of one word
    * type (with its corpus frequency) as of the START of `round` — the
    * table the round-`round` merge decision was computed from.
    */
  final case class StateRow(round: Int, syms: Seq[String], freq: Long)

  /** Corpus → word-type frequency table: the single corpus-wide aggregation
    * all training iterations run on. Whitespace words, matching the rest of
    * the text tier (and `string_split(text, ' ')` on the oracle side).
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Bounded driver collect of the type table: top-`maxWordTypes` by
    * (freq DESC, word ASC) — deterministic truncation, the documented
    * large-vocabulary recipe (see object doc). The sort+limit runs in
    * Spark, so the collect is bounded by construction at any corpus size.
    */
  def collectWordTable(wc: DataFrame, maxWordTypes: Int): Array[(String, Long)] = {
    require(maxWordTypes > 0, s"maxWordTypes must be positive, got $maxWordTypes")
    wc.orderBy(col("freq").desc, col("word").asc).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  private[graft] def initSyms(word: String, byteLevel: Boolean): Array[String] =
    if (byteLevel) {
      val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new Array[String](bytes.length + 1)
      var i = 0
      while (i < bytes.length) { out(i) = byteToChar(bytes(i) & 0xff).toString; i += 1 }
      out(bytes.length) = EndOfWord
      out
    } else {
      require(!word.exists(Character.isSurrogate),
        "char-level BPE is BMP-only (symbol = one UTF-16 char); word contains " +
          "a surrogate pair — train with byteLevel = true for arbitrary UTF-8")
      val out = new Array[String](word.length + 1)
      var i = 0
      while (i < word.length) { out(i) = word.charAt(i).toString; i += 1 }
      out(word.length) = EndOfWord
      out
    }

  /** Leftmost-first non-overlapping replacement of the adjacent pair
    * (l, r) with the merged symbol l+r — the BPE state transition, shared
    * verbatim by training and encoding so their fixpoints coincide.
    */
  private[graft] def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    out.sizeHint(syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The merge loop over a driver-local word-type table. Counts are plain
    * adjacent-pair counts (overlapping occurrences each count — "aaa"
    * contributes (a,a) twice) weighted by word frequency; recounted from
    * scratch each round (rounds × types × avg-len work — the type table is
    * bounded, so exactness beats incremental bookkeeping here). Stops early
    * when no adjacent pair remains. With `recordStates`, the pre-merge
    * table of every DECIDED round is captured for the oracle export.
    */
  def trainLocal(words: Seq[(String, Long)], numMerges: Int,
      recordStates: Boolean = false, byteLevel: Boolean = false)
      : (Vector[Merge], Vector[StateRow]) = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    var table: Array[(Array[String], Long)] =
      words.map { case (w, f) => (initSyms(w, byteLevel), f) }.toArray
    val merges = Vector.newBuilder[Merge]
    val states = Vector.newBuilder[StateRow]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val cnt = mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- table) {
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (cnt.isEmpty) exhausted = true
      else {
        val ((l, r), _) = cnt.minBy { case ((a, b), c) => (-c, a, b) }
        if (recordStates)
          for ((syms, f) <- table) states += StateRow(round, syms.toVector, f)
        merges += Merge(round, l, r)
        table = table.map { case (syms, f) => (applyMerge(syms, l, r), f) }
        round += 1
      }
    }
    (merges.result(), states.result())
  }

  /** Train over a corpus: ONE distributed aggregation, then the local merge
    * loop over the bounded type table.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWordTypes: Int = 1 << 20, byteLevel: Boolean = false): Vector[Merge] =
    trainLocal(collectWordTable(wordCounts(df, textCol), maxWordTypes),
      numMerges, byteLevel = byteLevel)._1

  /** The merge loop WITHOUT the driver table: rounds of small distributed
    * pair-count aggregations over the word-TYPE table (seeded on executors
    * by the SAME `initSyms` the local loop uses — one seeding function for
    * both loops by construction) with the argmax under the documented
    * tie-break, and the state transition as the SAME JVM `applyMerge`.
    * Closes `train`'s top-K truncation for vocabularies past driver
    * memory: the type table only ever lives as a cached distributed
    * collection.
    *
    * Each round can BATCH up to `batchMax` merges while provably
    * reproducing the sequential decision sequence. From one pair-count
    * aggregation the round takes the rank-ordered candidates
    * (cnt DESC, lsym, rsym) and admits a PREFIX of them, stopping at the
    * first candidate j that fails either test against the already-admitted
    * merges i < j:
    *   1. symbol-disjointness — {l_j, r_j} ∩ {l_i, r_i} = ∅, so applying
    *      merge i cannot change candidate j's count (a merge only touches
    *      counts of pairs sharing one of its symbols), and the chained
    *      batch application equals the sequential application;
    *   2. cnt_j strictly exceeds every admitted bound_i, where bound_i caps
    *      the count any pair INVOLVING the new symbol l_i+r_i can reach at
    *      any intermediate state: a created instance (x, l_i r_i) comes
    *      from a pre-state context "… x l_i r_i …" which contains the
    *      pre-state pair (x', l_i) — so created counts ≤
    *      max(max_x cnt(x, l_i), max_y cnt(r_i, y)), capped at cnt_i; and
    *      if the STRING l_i+r_i already occurs as a live symbol (so created
    *      instances would top up an existing pair's count), bound_i is ∞.
    * Under 1+2 the argmax after applying merges 1..j-1 is exactly candidate
    * j, so the batch is the sequential prefix — merge-for-merge, every
    * corpus (`BpeSpec` gates equality with `trainLocal`, including on
    * interacting-pair corpora that force the fallback to batch size 1).
    * The bounds come from one extra filtered pass over the round's cached
    * count RDD, attempted only when the top-2 candidates are disjoint and
    * backed off exponentially while batches keep admitting a single merge
    * (the natural-language common case, where high-frequency contexts
    * dominate the bound); worst case therefore degenerates to exactly the
    * sequential loop.
    */
  def trainDistributed(wc: DataFrame, numMerges: Int,
      byteLevel: Boolean = false, batchMax: Int = 8): Vector[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(batchMax >= 1, s"batchMax must be >= 1, got $batchMax")
    // The merge loop is genuinely imperative per-row work repeated ~64
    // times over the same bounded frame — the documented RDD case. The r9
    // Catalyst form paid ~300 ms/round in PLAN cost alone (every round
    // analyzes + codegens a fresh explode/agg/fold plan, its merge-pair
    // literals defeating any plan cache) for a flat ~20 s at 64 merges
    // regardless of corpus; RDD closures compile once and each round is a
    // single reduceByKey + takeOrdered job over the cached type table
    // (~4 s for the same 64 merges), with the transition as the SAME JVM
    // `applyMerge` the local loop runs — one transition function, every
    // path. Tie-breaks stay consistent across loops and the DuckDB oracle
    // because both seed alphabets are BMP-only (char-level enforces it
    // loudly, byte-level maps into U+0021..U+0143), where Java's UTF-16
    // order ≡ code-point order ≡ UTF-8 byte order.
    val spark = wc.sparkSession
    import spark.implicits._
    val seedRdd = wc.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)].rdd
      .map { case (w, f) => (initSyms(w, byteLevel), f) }
    var table = seedRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    table.count()
    var persistedRoot = table
    val merges = Vector.newBuilder[Merge]
    var round = 0
    var sinceCheckpoint = 0
    // bounds-job backoff: on natural-language corpora the created-pair
    // bound is usually dominated by high-frequency contexts, so the batch
    // admits 1 merge and the bounds job is pure overhead — skip it for
    // exponentially growing stretches while that keeps being true (a
    // skipped round IS the sequential semantics, so this is pace, not
    // correctness; regular corpora where batching fires keep it hot)
    var boundsWait = 0
    var boundsBackoff = 1
    var exhausted = false
    // (cnt desc, l asc, r asc) — the documented decision order
    val topOrd = Ordering.by[((String, String), Long), (Long, String, String)] {
      case ((l, r), c) => (-c, l, r)
    }
    def pairCounts(t: org.apache.spark.rdd.RDD[(Array[String], Long)]) =
      t.mapPartitions { it =>
        val acc = mutable.HashMap.empty[(String, String), Long]
        for ((syms, f) <- it) {
          var i = 0
          while (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            acc.update(k, acc.getOrElse(k, 0L) + f)
            i += 1
          }
        }
        acc.iterator
      }.reduceByKey(_ + _)
    try {
      while (round < numMerges && !exhausted) {
        val m = math.min(batchMax, numMerges - round)
        val needBounds = boundsWait == 0 && m > 1
        val counts = pairCounts(table)
        // cache only when the bounds pass will re-read it
        val countsC = if (needBounds)
          counts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else counts
        try {
          val top = countsC.takeOrdered(m)(topOrd)
            .map { case ((l, r), c) => (l, r, c) }
          if (top.isEmpty) exhausted = true
          else {
            // a bounds job can only pay off if the second candidate is
            // symbol-disjoint from the first
            val worthBounds = needBounds && top.length > 1 && {
              val (l0, r0, _) = top(0); val (l1, r1, _) = top(1)
              l1 != l0 && l1 != r0 && r1 != l0 && r1 != r0
            }
            // per-candidate created-pair bounds (see Scaladoc), one job
            val bounds: Array[Long] =
              if (!worthBounds) {
                if (boundsWait > 0) boundsWait -= 1
                Array(Long.MaxValue) // batch of 1 — sequential semantics
              } else {
                val lefts = top.map(_._1).toSet
                val rights = top.map(_._2).toSet
                val merged = top.map(t => t._1 + t._2).toSet
                // keep the pairs the bounds measure: (x, l_i) — pair-RIGHT
                // in the candidate LEFTS — and (r_i, y) — pair-LEFT in the
                // candidate RIGHTS (the inverted selectors silently
                // understated the bound and could admit a non-sequential
                // batch; round-10 review finding)
                val rel = countsC.filter { case ((l, r), _) =>
                  lefts.contains(r) || rights.contains(l) ||
                    merged.contains(l) || merged.contains(r)
                }.collect()
                top.map { case (l, r, c) =>
                  val collide = rel.exists { case ((pl, pr), _) =>
                    pl == l + r || pr == l + r }
                  if (collide) Long.MaxValue
                  else {
                    var a = 0L; var b = 0L
                    rel.foreach { case ((pl, pr), pc) =>
                      if (pr == l) a = math.max(a, pc)
                      if (pl == r) b = math.max(b, pc)
                    }
                    math.min(c, math.max(a, b))
                  }
                }
              }
            val selected = mutable.ArrayBuffer.empty[(String, String)]
            val used = mutable.HashSet.empty[String]
            var maxBound = 0L
            var stop = false
            var i = 0
            while (i < top.length && !stop) {
              val (l, r, c) = top(i)
              if (selected.isEmpty ||
                  (!used(l) && !used(r) && maxBound < Long.MaxValue && c > maxBound)) {
                selected += ((l, r)); used += l; used += r
                maxBound = math.max(maxBound, bounds(i))
              } else stop = true
              i += 1
            }
            // adapt the backoff from what the batch actually bought
            if (worthBounds) {
              if (selected.size > 1) boundsBackoff = 1
              else {
                boundsWait = boundsBackoff
                boundsBackoff = math.min(16, boundsBackoff * 2)
              }
            }
            for ((l, r) <- selected) { merges += Merge(round, l, r); round += 1 }
            val sel = selected.toArray
            table = table.map { case (syms, f) =>
              var s = syms
              var j = 0
              while (j < sel.length) { s = applyMerge(s, sel(j)._1, sel(j)._2); j += 1 }
              (s, f)
            }
            // cadence: bound the recompute span (the maps are narrow, so
            // only persistence matters — RDD lineage has no analyzer cost)
            sinceCheckpoint += selected.size
            if (sinceCheckpoint >= 8) {
              sinceCheckpoint = 0
              table.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              table.count()
              persistedRoot.unpersist(false)
              persistedRoot = table
            }
          }
        } finally if (needBounds) countsC.unpersist(false)
      }
      // ranks are decision order, one per merge — rewrite the batch-local
      // `round` stamps into a clean 0..n-1 sequence
      merges.result().zipWithIndex.map { case (mg, i) => mg.copy(rank = i) }
    } finally persistedRoot.unpersist(false)
  }

  /** Encode one word: repeatedly merge the lowest-rank adjacent pair
    * present (the GPT-2 encode loop). Because a merge never creates a new
    * adjacency between pre-existing symbols, this reproduces the training
    * fixpoint exactly on trained words (gated by BpeSpec).
    */
  def encodeWord(word: String, rankOf: collection.Map[(String, String), Int],
      byteLevel: Boolean = false): Array[String] = {
    var syms = initSyms(word, byteLevel)
    var more = true
    while (more && syms.length > 1) {
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.length - 1) {
        rankOf.get((syms(i), syms(i + 1))) match {
          case Some(rk) if rk < best => best = rk; bl = syms(i); br = syms(i + 1)
          case _ =>
        }
        i += 1
      }
      if (best == Int.MaxValue) more = false
      else syms = applyMerge(syms, bl, br)
    }
    syms
  }

  /** Distributed encode of DISTINCT words: per-partition greedy merge with
    * the broadcast rank map (genuinely imperative per-word iteration — the
    * documented mapPartitions case; the corpus-level consumer joins this
    * small table back broadcast, so the corpus itself never runs the loop).
    */
  def encodeWordsDf(words: DataFrame, wordCol: String, merges: Seq[Merge],
      byteLevel: Boolean = false): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.map(m => ((m.lsym, m.rsym), m.rank)).toMap)
    val ds: Dataset[String] = words.select(col(wordCol).cast("string")).as[String]
    ds.mapPartitions { it =>
      val rk = bc.value
      it.map(w => (w, encodeWord(w, rk, byteLevel).toSeq))
    }.toDF(wordCol, "toks")
  }
}
