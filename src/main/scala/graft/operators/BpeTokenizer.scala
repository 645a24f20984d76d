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
  * Symbols are UTF-16 chars (ASCII/BMP corpora; a production byte-level
  * variant would seed from UTF-8 bytes exactly like GPT-2's).
  */
object Bpe {

  /** Classic end-of-word marker (Sennrich): makes "low" the word-final
    * token distinct from "low" inside "lower".
    */
  val EndOfWord = "</w>"

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

  private def initSyms(word: String): Array[String] = {
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
      recordStates: Boolean = false): (Vector[Merge], Vector[StateRow]) = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    var table: Array[(Array[String], Long)] =
      words.map { case (w, f) => (initSyms(w), f) }.toArray
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
      maxWordTypes: Int = 1 << 20): Vector[Merge] =
    trainLocal(collectWordTable(wordCounts(df, textCol), maxWordTypes),
      numMerges)._1

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

  /** The merge loop WITHOUT the driver table: every round is one small
    * Spark aggregation over the word-TYPE frame (adjacent-pair explode →
    * count → argmax with the documented tie-break) followed by the
    * fold-merge projection above. Closes `train`'s top-K truncation for
    * vocabularies past driver memory: the type table only ever lives as a
    * DataFrame. Cost: `numMerges` tiny jobs over a type-table-sized frame
    * (NOT the corpus — same scale shape as the local loop). The frame is
    * checkpointed every few rounds so the per-round `transform` lineage
    * cannot compound into exponential plan growth.
    */
  def trainDistributed(wc: DataFrame, numMerges: Int): Vector[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = wc.sparkSession
    // char split: regex "" can emit a trailing empty element depending on
    // the engine's limit semantics — filter empties so the symbol seq is
    // exactly initSyms's chars + EndOfWord
    var table = wc.select(
      concat(filter(split(col("word"), ""), s => s =!= lit("")),
        array(lit(EndOfWord))).as("syms"),
      col("freq").cast("long").as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = Vector.newBuilder[Merge]
    var round = 0
    var exhausted = false
    try {
      while (round < numMerges && !exhausted) {
        val best = table
          .select(col("freq"), col("syms"), posexplode(slice(col("syms"), lit(1),
            greatest(size(col("syms")) - 1, lit(0)))))
          .select(col("freq"), col("col").as("lsym"),
            element_at(col("syms"), col("pos") + 2).as("rsym"))
          .groupBy(col("lsym"), col("rsym")).agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("lsym").asc, col("rsym").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val l = best(0).getString(0)
          val r = best(0).getString(1)
          merges += Merge(round, l, r)
          val next = table.select(applyMergeCol(col("syms"), l, r).as("syms"),
            col("freq"))
          // checkpoint cadence: break the per-round transform lineage
          val mat = if ((round + 1) % 8 == 0) next.localCheckpoint(true)
            else next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          mat.count()
          table.unpersist(false)
          table = mat
          round += 1
        }
      }
      merges.result()
    } finally table.unpersist(false)
  }

  /** Encode one word: repeatedly merge the lowest-rank adjacent pair
    * present (the GPT-2 encode loop). Because a merge never creates a new
    * adjacency between pre-existing symbols, this reproduces the training
    * fixpoint exactly on trained words (gated by BpeSpec).
    */
  def encodeWord(word: String, rankOf: collection.Map[(String, String), Int]): Array[String] = {
    var syms = initSyms(word)
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
  def encodeWordsDf(words: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.map(m => ((m.lsym, m.rsym), m.rank)).toMap)
    val ds: Dataset[String] = words.select(col(wordCol).cast("string")).as[String]
    ds.mapPartitions { it =>
      val rk = bc.value
      it.map(w => (w, encodeWord(w, rk).toSeq))
    }.toDF(wordCol, "toks")
  }
}
