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

  /** Leftmost-first non-overlapping (l, r) → l+r replacement as a Catalyst
    * higher-order fold — `applyMerge`'s distributed twin (BpeSpec pins the
    * equality). State carries a one-symbol lookahead buffer: merging
    * consumes (buf, s); otherwise buf flushes and s becomes the buffer.
    */
  private def applyMergeCol(syms: org.apache.spark.sql.Column, l: String,
      r: String): org.apache.spark.sql.Column = {
    val init = struct(
      array().cast("array<string>").as("out"), lit(null).cast("string").as("buf"))
    aggregate(syms, init,
      (st, s) => when(st.getField("buf") === l && s === r,
          struct(concat(st.getField("out"), array(lit(l + r))).as("out"),
            lit(null).cast("string").as("buf")))
        .otherwise(struct(
          when(st.getField("buf").isNull, st.getField("out"))
            .otherwise(concat(st.getField("out"), array(st.getField("buf"))))
            .as("out"),
          s.as("buf"))),
      st => when(st.getField("buf").isNull, st.getField("out"))
        .otherwise(concat(st.getField("out"), array(st.getField("buf")))))
  }

  /** Seed the distributed type frame with the SAME JVM `initSyms` the local
    * loop uses (executor-side mapPartitions over the bounded type table —
    * never the corpus). One seeding function for both loops by construction:
    * the previous `split(word, "")` seeding split by code point while the
    * local loop split by UTF-16 code unit, so the two silently diverged on
    * non-BMP text.
    */
  private def seedFrame(wc: DataFrame, byteLevel: Boolean): DataFrame = {
    val spark = wc.sparkSession
    import spark.implicits._
    wc.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions(it => it.map { case (w, f) => (initSyms(w, byteLevel).toSeq, f) })
      .toDF("syms", "freq")
  }

  /** The merge loop WITHOUT the driver table: rounds of small Spark
    * aggregations over the word-TYPE frame (adjacent-pair explode → count →
    * argmax with the documented tie-break) followed by the fold-merge
    * projection above. Closes `train`'s top-K truncation for vocabularies
    * past driver memory: the type table only ever lives as a DataFrame.
    *
    * Each round BATCHES up to `batchMax` merges while provably reproducing
    * the sequential decision sequence (the r9 loop paid ~375 ms/merge in
    * pure per-round scheduling — 64 rounds of tiny jobs). From one
    * pair-count aggregation the round takes the rank-ordered candidates
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
    * The bounds come from one extra small aggregation per round on the
    * persisted count frame; worst case (every round batches 1) degenerates
    * to the old loop plus that one job.
    */
  def trainDistributed(wc: DataFrame, numMerges: Int,
      byteLevel: Boolean = false, batchMax: Int = 8): Vector[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(batchMax >= 1, s"batchMax must be >= 1, got $batchMax")
    var table = seedFrame(wc, byteLevel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    table.count()
    val merges = Vector.newBuilder[Merge]
    var round = 0
    var sinceCheckpoint = 0
    var exhausted = false
    try {
      while (round < numMerges && !exhausted) {
        val counts = table
          .select(col("freq"), col("syms"), posexplode(slice(col("syms"), lit(1),
            greatest(size(col("syms")) - 1, lit(0)))))
          .select(col("freq"), col("col").as("lsym"),
            element_at(col("syms"), col("pos") + 2).as("rsym"))
          .groupBy(col("lsym"), col("rsym")).agg(sum(col("freq")).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val m = math.min(batchMax, numMerges - round)
          val top = counts
            .orderBy(col("cnt").desc, col("lsym").asc, col("rsym").asc)
            .limit(m).collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          if (top.isEmpty) exhausted = true
          else {
            // per-candidate created-pair bounds (see Scaladoc), one job
            val bounds: Array[Long] =
              if (top.length == 1) Array(Long.MaxValue)
              else {
                val aggs = top.toSeq.zipWithIndex.flatMap { case ((l, r, c), i) => Seq(
                  max(when(col("rsym") === lit(l), col("cnt"))).as(s"a$i"),
                  max(when(col("lsym") === lit(r), col("cnt"))).as(s"b$i"),
                  max(when(col("lsym") === lit(l + r) || col("rsym") === lit(l + r),
                    col("cnt"))).as(s"k$i")) }
                val row = counts.agg(aggs.head, aggs.tail: _*).collect()(0)
                top.indices.map { i =>
                  val collide = !row.isNullAt(3 * i + 2)
                  if (collide) Long.MaxValue
                  else {
                    val a = if (row.isNullAt(3 * i)) 0L else row.getLong(3 * i)
                    val b = if (row.isNullAt(3 * i + 1)) 0L else row.getLong(3 * i + 1)
                    math.min(top(i)._3, math.max(a, b))
                  }
                }.toArray
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
            for ((l, r) <- selected) { merges += Merge(round, l, r); round += 1 }
            val next = table.select(
              selected.foldLeft(col("syms")) { case (c, (l, r)) =>
                applyMergeCol(c, l, r) }.as("syms"),
              col("freq"))
            // checkpoint cadence: break the per-round transform lineage
            sinceCheckpoint += selected.size
            val mat = if (sinceCheckpoint >= 8) { sinceCheckpoint = 0; next.localCheckpoint(true) }
              else next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            mat.count()
            table.unpersist(false)
            table = mat
          }
        } finally counts.unpersist(false)
      }
      // ranks are decision order, one per merge — rewrite the batch-local
      // `round` stamps into a clean 0..n-1 sequence
      merges.result().zipWithIndex.map { case (mg, i) => mg.copy(rank = i) }
    } finally table.unpersist(false)
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
