package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gram_stats(tokens ARRAY<STRING>, n)` → STRUCT<n_grams, n_dup, max_freq,
  * sum_len BIGINT>: one-pass per-row n-gram statistics — gram count,
  * duplicated-gram count, top-gram multiplicity (the Gopher repetition
  * signals), and total token character length.
  *
  * Replaces the interpreted higher-order-function formulation
  * (`aggregate(array_sort(...), struct-accumulator)`): HOFs are
  * CodegenFallback, and the per-element struct allocation measured 60×+
  * CPU inflation under many-core execution (see ROUND_NOTES r4). This
  * kernel is a single hash-count pass — O(g) per row, allocation limited
  * to the gram keys — and stays inside whole-stage codegen via a static
  * call, so it parallelizes cleanly at scan width.
  */
case class GramStats(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_dup", LongType, nullable = false),
    StructField("max_freq", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override protected def nullSafeEval(v: Any): Any =
    GramStats.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GramStats.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramStats {
  private val space = UTF8String.fromString(" ")

  /** Static kernel body (called from generated code — no expression-tree
    * interpretation per row). Tokens shorter than n grams yield zeros.
    */
  def compute(toks: ArrayData, n: Int): InternalRow = {
    val m = toks.numElements()
    var sumLen = 0L
    var i = 0
    while (i < m) { sumLen += toks.getUTF8String(i).numChars(); i += 1 }
    val g = m - n + 1
    if (g <= 0) return InternalRow(0L, 0L, 0L, sumLen)
    val counts = new java.util.HashMap[UTF8String, Array[Long]](g * 2)
    var maxFreq = 0L
    i = 0
    while (i < g) {
      val key =
        if (n == 1) toks.getUTF8String(i)
        else {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
          UTF8String.concatWs(space, parts: _*)
        }
      var c = counts.get(key)
      if (c == null) { c = Array(0L); counts.put(key, c) }
      c(0) += 1
      if (c(0) > maxFreq) maxFreq = c(0)
      i += 1
    }
    InternalRow(g.toLong, g.toLong - counts.size, maxFreq, sumLen)
  }
}
