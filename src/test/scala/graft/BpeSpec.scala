package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE tokenizer (Sennrich arXiv:1508.07909): the operator's merge loop and
  * encoder against an INDEPENDENT naive reference (space-joined strings +
  * split-based replacement — the paper's own reference style, deliberately a
  * different representation from the operator's symbol arrays), plus the
  * paper's worked example, tie-break determinism, truncation, early stop,
  * and the distributed-encode twin. The state TRANSITION gate here is what
  * the DuckDB oracle (which re-derives each merge DECISION from exported
  * states) deliberately leaves to Scala.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent naive reference ----------------------------------------
  // words as space-joined symbol strings; one merge = split to symbols,
  // rebuild with a cursor. Recounts everything each round with plain maps.
  private def naiveTrain(words: Seq[(String, Long)], numMerges: Int)
      : Vector[(String, String)] = {
    var table = words.map { case (w, f) =>
      ((w.map(_.toString) :+ Bpe.EndOfWord).mkString(" "), f) }
    val out = Vector.newBuilder[(String, String)]
    var r = 0
    var stop = false
    while (r < numMerges && !stop) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- table; Array(a, b) <- s.split(" ").sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val best = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        out += best
        table = table.map { case (s, f) =>
          val syms = s.split(" ")
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              nb += best._1 + best._2; i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.result().mkString(" "), f)
        }
        r += 1
      }
    }
    out.result()
  }

  test("paper's worked example: low/lower/newest/widest merges") {
    // Sennrich et al. Fig. 1 corpus: low x5, lower x2, newest x6, widest x3
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val (merges, _) = Bpe.trainLocal(words, 4)
    // round 0: (e,s) cnt 9 from newest+widest; round 1: (es,t) 9; round 2:
    // (est,</w>) 9; round 3: (l,o) 7
    assert(merges.map(m => (m.lsym, m.rsym)) ===
      Vector(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
  }

  test("trainLocal == independent naive reference on a generated corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    val words = (0 until 120).map { _ =>
      (0 to 2 + rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.groupBy(identity).view.mapValues(_.size.toLong * (1 + rnd.nextInt(5))).toSeq
    val want = naiveTrain(words, 25)
    val (got, states) = Bpe.trainLocal(words, 25, recordStates = true)
    assert(got.map(m => (m.lsym, m.rsym)) === want)
    assert(got.map(_.rank) === got.indices.toVector, "ranks must be 0..n-1")
    // states cover exactly the decided rounds, one row per word type
    assert(states.map(_.round).distinct === got.indices.toVector)
    assert(states.count(_.round == 0) === words.size)
  }

  test("tie-break: equal counts resolve by (lsym, rsym) binary order") {
    // "xy" and "ab" both occur twice; (a,b) < (x,y) lexicographically
    val (merges, _) = Bpe.trainLocal(Seq(("xy", 2L), ("ab", 2L)), 1)
    assert((merges.head.lsym, merges.head.rsym) === ("a", "b"))
  }

  test("early stop: merge loop exhausts when no adjacent pairs remain") {
    // single word fully merges in (len-1)+1 rounds, then stops
    val (merges, _) = Bpe.trainLocal(Seq(("abc", 1L)), 100)
    assert(merges.size < 100 && merges.nonEmpty)
    // final state is the fully merged single symbol: encode agrees
    val rankOf = merges.map(m => ((m.lsym, m.rsym), m.rank)).toMap
    assert(Bpe.encodeWord("abc", rankOf).toSeq === Seq("abc" + Bpe.EndOfWord))
  }

  test("encodeWord reproduces the training fixpoint on every trained word") {
    val rnd = new scala.util.Random(7)
    val words = (0 until 80).map { _ =>
      (0 to 1 + rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
    }.distinct.map(w => (w, 1L + rnd.nextInt(9)))
    val (merges, _) = Bpe.trainLocal(words, 30)
    val rankOf = merges.map(m => ((m.lsym, m.rsym), m.rank)).toMap
    // replay training transitions to the final table
    var table = words.map { case (w, f) =>
      (w.map(_.toString).toArray :+ Bpe.EndOfWord, f) }
    for (m <- merges)
      table = table.map { case (s, f) => (Bpe.applyMerge(s, m.lsym, m.rsym), f) }
    for (((w, _), (finalSyms, _)) <- words.zip(table))
      assert(Bpe.encodeWord(w, rankOf).toSeq === finalSyms.toSeq,
        s"encode('$w') diverged from the training fixpoint")
    // unseen words still round-trip: concatenation reconstructs word+</w>
    for (w <- Seq("zzz", "abcz", "q"))
      assert(Bpe.encodeWord(w, rankOf).mkString === w + Bpe.EndOfWord)
  }

  test("maxWordTypes truncation == training on the manually truncated table") {
    val words = Seq(("aaa", 9L), ("bbb", 7L), ("abab", 7L), ("ccc", 1L))
    val wc = words.toDF("word", "freq")
    val top3 = Bpe.collectWordTable(wc, 3)
    // (freq DESC, word ASC): aaa, abab, bbb
    assert(top3.map(_._1).toSeq === Seq("aaa", "abab", "bbb"))
    val viaDf = Bpe.trainLocal(top3, 5)._1
    val manual = Bpe.trainLocal(
      Seq(("aaa", 9L), ("abab", 7L), ("bbb", 7L)), 5)._1
    assert(viaDf === manual)
  }

  test("trainDistributed == trainLocal: the fold-merge frame loop needs no driver table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val wc = Bpe.wordCounts(docs, "text")
    val local = Bpe.trainLocal(Bpe.collectWordTable(wc, 1 << 20), 20)._1
    val dist = Bpe.trainDistributed(wc, 20)
    assert(dist === local,
      "distributed merge loop must reproduce the local loop merge-for-merge")
    // early stop parity on a tiny exhaustible corpus (incl. the
    // fold-merge's lookahead-buffer edge: "aaa" merges leftmost-first)
    val tiny = Seq(("aaa", 3L), ("ab", 1L)).toDF("word", "freq")
    val dTiny = Bpe.trainDistributed(tiny, 100)
    val lTiny = Bpe.trainLocal(Seq(("aaa", 3L), ("ab", 1L)), 100)._1
    assert(dTiny === lTiny)
    assert(dTiny.size < 100, "must stop when no adjacent pairs remain")
  }

  test("batched trainDistributed == trainLocal on interacting-pair corpora") {
    // corpora built so top pairs SHARE symbols (chains "ababab", "aaaa"),
    // forcing the batch admissibility tests to reject and fall back toward
    // batch size 1 — sequence equality must hold regardless
    val corpora = Seq(
      Seq(("ababab", 5L), ("abab", 3L), ("ba", 7L)),
      Seq(("aaaa", 4L), ("aaab", 4L), ("baaa", 3L)),
      Seq(("abcabc", 2L), ("bcabca", 2L), ("cabcab", 2L)))
    for (words <- corpora) {
      val wc = words.toDF("word", "freq")
      val local = Bpe.trainLocal(words, 15)._1
      for (bm <- Seq(1, 4, 8)) {
        val dist = Bpe.trainDistributed(wc, 15, batchMax = bm)
        assert(dist === local, s"batchMax=$bm diverged on $words")
      }
    }
  }

  test("batched trainDistributed fuzz: random tight-alphabet corpora ≡ trainLocal") {
    // small alphabets maximize pair interaction and merged-symbol reuse —
    // the regime where an understated created-pair bound admits a
    // non-sequential batch (the round-10 review found exactly that: the
    // bounds pass filtered with lefts/rights swapped; this fuzz is its
    // regression net)
    for (seed <- Seq(101, 202, 303, 404)) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abc"
      val words = (0 until 60).map { _ =>
        (0 to 1 + rnd.nextInt(7)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.groupBy(identity).view.mapValues(_.size.toLong * (1 + rnd.nextInt(4))).toSeq
      val local = Bpe.trainLocal(words, 20)._1
      val dist = Bpe.trainDistributed(words.toDF("word", "freq"), 20, batchMax = 8)
      assert(dist === local, s"seed=$seed batched sequence diverged")
    }
  }

  test("byte-level: bijection, decode round-trip on emoji/CJK, char-level loud-fails") {
    // GPT-2 bytes_to_unicode: a 256-element bijection into BMP printables
    assert(Bpe.byteToChar.length === 256)
    assert(Bpe.byteToChar.distinct.length === 256)
    assert(Bpe.byteToChar.forall(c => c >= '!' && c.toInt < 0x0144))
    assert(!Bpe.byteToChar.exists(Character.isSurrogate))
    // printable ASCII maps to itself (GPT-2 contract)
    for (c <- '!' to '~') assert(Bpe.byteToChar(c.toInt) === c)
    // decode(initSyms) round-trips arbitrary UTF-8: emoji (non-BMP, 4-byte),
    // CJK, combining marks, Latin-1
    for (w <- Seq("héllo", "日本語", "👍🏽emoji", "🧪", "áb", "普通话123"))
      assert(Bpe.decodeByteSyms(
        Bpe.initSyms(w, byteLevel = true).toSeq) === w, s"round-trip '$w'")
    // char-level on non-BMP input fails LOUDLY, not with garbage symbols
    val e = intercept[IllegalArgumentException] {
      Bpe.trainLocal(Seq(("a👍b", 1L)), 5)
    }
    assert(e.getMessage.contains("byteLevel"))
  }

  test("byte-level ≡ char-level merges on printable-ASCII corpora") {
    // printable ASCII bytes map to themselves, so the two seedings produce
    // identical symbol tables and hence identical merges
    val rnd = new scala.util.Random(11)
    val words = (0 until 100).map { _ =>
      (0 to 2 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(9)).toChar).mkString
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val ch = Bpe.trainLocal(words, 20)._1
    val by = Bpe.trainLocal(words, 20, byteLevel = true)._1
    assert(by === ch)
    // and the distributed loop agrees under byte-level seeding too
    val dist = Bpe.trainDistributed(words.toDF("word", "freq"), 20, byteLevel = true)
    assert(dist === by)
  }

  test("byte-level training + encode on multi-byte text: fixpoint and round-trip") {
    val words = Seq(("日本語", 6L), ("日本", 4L), ("語学", 3L), ("👍👍", 2L), ("ascii", 5L))
    val (merges, states) = Bpe.trainLocal(words, 12, recordStates = true,
      byteLevel = true)
    assert(merges.nonEmpty)
    // every state symbol is a mapped printable string or </w> — exportable
    // through the same parquet/oracle channel as char-level states
    assert(states.forall(_.syms.forall(s =>
      s == Bpe.EndOfWord || !s.exists(Character.isSurrogate))))
    val rankOf = merges.map(m => ((m.lsym, m.rsym), m.rank)).toMap
    for ((w, _) <- words) {
      val toks = Bpe.encodeWord(w, rankOf, byteLevel = true)
      assert(Bpe.decodeByteSyms(toks.toSeq) === w, s"decode(encode('$w'))")
    }
    // distributed encode twin under byte-level
    val got = Bpe.encodeWordsDf(words.toDF("word", "freq"), "word", merges,
      byteLevel = true).select(col("word"), col("toks"))
      .as[(String, Seq[String])].collect().toMap
    for ((w, _) <- words)
      assert(got(w) === Bpe.encodeWord(w, rankOf, byteLevel = true).toSeq)
  }

  test("distributed encodeWordsDf == driver encodeWord, token stats consistent") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val wc = Bpe.wordCounts(docs, "text")
    val table = Bpe.collectWordTable(wc, 1 << 20)
    val (merges, _) = Bpe.trainLocal(table, 32)
    val rankOf = merges.map(m => ((m.lsym, m.rsym), m.rank)).toMap
    val got = Bpe.encodeWordsDf(wc, "word", merges)
      .select(col("word"), col("toks")).as[(String, Seq[String])]
      .collect().toMap
    assert(got.keySet === table.map(_._1).toSet)
    for ((w, toks) <- got)
      assert(toks === Bpe.encodeWord(w, rankOf).toSeq,
        s"distributed encode of '$w' diverged from the driver twin")
    // declared-query shape: per-doc n_tokens equals a brute-force recount
    val stats = graft.queries.CorpusStatsQueries.bpeTokenStats(spark, sf0001)
      .select(col("doc_id").cast("string"), col("n_words"), col("n_tokens"))
      .as[(String, Long, Long)].collect()
    // column order is (doc_id?, ...) — recount independently from text
    val byDoc = docs.select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)].collect().toMap
    val trainedRank = Bpe.train(docs, "text", 32)
      .map(m => ((m.lsym, m.rsym), m.rank)).toMap
    assert(trainedRank === rankOf, "train() convenience wrapper drifted")
    for ((docId, nWords, nTokens) <- stats) {
      val ws = byDoc(docId).split(" ", -1)
      assert(nWords === ws.length.toLong, s"doc $docId word count")
      assert(nTokens === ws.map(w => Bpe.encodeWord(w, rankOf).length.toLong).sum,
        s"doc $docId BPE token count diverged from brute-force recount")
    }
  }
}
