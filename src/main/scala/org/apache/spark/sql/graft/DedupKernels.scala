package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row dedup-pipeline kernels. Each replaces an
  * explode → (aggregate | O(chars²) interpreted lambda) stage of the text
  * dedup operators with one whole-stage-codegen-friendly pass over the row:
  *
  *  - [[CharGrams]]: sliding char windows with ONE offset pre-scan — the
  *    `transform(sequence(...), i -> substring(t, i, L))` it replaces
  *    re-scans the string from byte 0 on every call (UTF-8 char addressing),
  *    i.e. O(chars²) per document, measured as the dominant stage of
  *    `substr_dedup`.
  *  - [[MinHashSig]]: the whole shingle → distinct → 63-way seeded-min
  *    reduction in-row, replacing explode + a 64-column hash aggregate
  *    (per exploded row: one agg-hash probe + 63 buffer compare-updates).
  *    Hash composition is bit-identical to the aggregation form
  *    (`xxhash64(gram)` then `xxhash64(i, h)` = XXH64 seed-chaining), and
  *    distinctness is on the exact gram STRINGS, so signatures AND the
  *    shingle-set size `n` match the old pipeline exactly.
  *  - [[SimHash60]]: the per-token md5-nibble vote reduction in-row,
  *    replacing explode + a 60-column sum aggregate. Same md5-derived bit
  *    votes (value-identical signatures — the DuckDB oracle replays them).
  */
object DedupKernels {
  private[graft] val Space = UTF8String.fromString(" ")

  /** Gram = tokens[start, start+n) joined by one space; `n == 0` means ALL
    * tokens (the short-document whole-text fallback — `split` preserves
    * empty tokens, so the re-join reproduces the original text bytes).
    */
  private def gram(toks: ArrayData, start: Int, n: Int): UTF8String = {
    val k = if (n == 0) toks.numElements() else n
    if (k == 1) return toks.getUTF8String(start).copy()
    val parts = new Array[UTF8String](k)
    var j = 0
    while (j < k) { parts(j) = toks.getUTF8String(start + j); j += 1 }
    UTF8String.concatWs(Space, parts: _*)
  }

  /** Memory bound, stated (the explode+aggregate this replaces streamed and
    * spilled): the distinct-shingle HashSet holds every distinct n-gram
    * STRING of one document in task heap — ≈ n× the document's UTF-8 bytes
    * (each byte appears in ≤ n gram copies) plus set overhead, times the
    * executor's task concurrency. At the default 3-gram config a 100 MB
    * pathological document costs ~300 MB of task heap where the old form
    * would have spilled; corpora with multi-hundred-MB single documents
    * should chunk them upstream (every pipeline here ingests bounded
    * documents by contract — the bench corpora cap at kilobytes). Chosen
    * deliberately: the aggregation path paid a corpus-scale exchange + a
    * 64-column aggregate buffer per exploded gram on EVERY document to
    * stay robust to a document class the contract excludes.
    */
  def minhash(toks: ArrayData, n: Int, seeds: Array[Long]): InternalRow = {
    val m = toks.numElements()
    val mins = new Array[Long](seeds.length)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[UTF8String]
    var count = 0L
    def consume(g: UTF8String): Unit = if (seen.add(g)) {
      count += 1L
      val h = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset,
        g.numBytes, 42L)
      var i = 0
      while (i < seeds.length) {
        val r = XXH64.hashLong(h, seeds(i))
        if (r < mins(i)) mins(i) = r
        i += 1
      }
    }
    if (m < n) consume(gram(toks, 0, 0)) // whole text as one shingle
    else {
      var s = 0
      while (s <= m - n) { consume(gram(toks, s, n)); s += 1 }
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(mins), count))
  }

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def simhash60(toks: ArrayData): Long = {
    val md = md5Local.get()
    val votes = new Array[Int](60)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      md.reset()
      val d = md.digest(t.getBytes)
      // first 15 hex nibbles as one value: big-endian first 8 bytes >>> 4 —
      // exactly conv(substr(md5hex, 1, 15), 16, 10)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = h >>> 4
      var j = 0
      while (j < 60) {
        val shift = (14 - j / 4) * 4 + (j % 4)
        votes(j) += (if (((h >>> shift) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  def charGrams(s: UTF8String, n: Int): ArrayData = {
    val numChars = s.numChars()
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val bytes = s.getBytes // one copy per row at most
    // byte offset of every char start, computed once — each gram is then a
    // single byte-range slice instead of a from-zero char scan
    val offs = new Array[Int](numChars + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(numChars) = bytes.length
    val g = numChars - n + 1
    val out = new Array[Any](g)
    var k = 0
    while (k < g) {
      out(k) = UTF8String.fromBytes(bytes, offs(k), offs(k + n) - offs(k))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(tokens, n, numHashes)` → STRUCT<sigs ARRAY<BIGINT>, n BIGINT>:
  * per-row MinHash signature over distinct word `n`-gram shingles plus the
  * distinct-shingle count. Tokens shorter than n hash the whole re-joined
  * text as one shingle (the `Dedup.shingles` fallback). Values are
  * bit-identical to `min(xxhash64(i, xxhash64(s)))` over exploded distinct
  * shingles.
  */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  // seed chain of xxhash64(lit(i), h): the int literal folds into the seed
  @transient private lazy val seeds =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("sigs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(v: Any): Any =
    DedupKernels.minhash(v.asInstanceOf[ArrayData], n, seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.DedupKernels.minhash($c, $n, $seedsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash60(tokens)` → BIGINT: the 60-bit SimHash signature (md5-nibble
  * bit votes over every token occurrence, sign → bit), value-identical to
  * the explode + 60-sum aggregation form the oracle replays.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(v: Any): Any =
    DedupKernels.simhash60(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.DedupKernels.simhash60($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `chargrams(text, n)` → ARRAY<STRING>: all sliding `n`-character windows
  * (UTF-8 code-point addressed, one offset pre-scan per row). Strings
  * shorter than n chars yield an empty array.
  */
case class CharGrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"gram length must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chargrams"

  override protected def nullSafeEval(v: Any): Any =
    DedupKernels.charGrams(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.DedupKernels.charGrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
