package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ngrams(tokens ARRAY<STRING>, n, stride)` → ARRAY<STRING>: space-joined
  * word n-grams at the given stride (1 = sliding shingles, n = disjoint
  * passages). Tokens shorter than n yield an empty array — callers keep
  * their own short-doc fallback semantics.
  *
  * Replaces the `transform(sequence(1, m−n+1), i → concat_ws(" ",
  * slice(tokens, i, n)))` formulation: `transform` is an interpreted
  * higher-order function (CodegenFallback) that re-walks the lambda
  * expression tree per gram and allocates a slice array per element. This
  * kernel builds each gram with one byte-copy inside whole-stage codegen —
  * the gram-construction map stage is the dominant cost of every shingle
  * pipeline (dedup, decontam, fingerprint, vocabulary stats).
  */
case class NGrams(child: Expression, n: Int, stride: Int = 1)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"gram size must be >= 1, got $n")
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams"

  override protected def nullSafeEval(v: Any): Any =
    NGrams.compute(v.asInstanceOf[ArrayData], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.NGrams.compute($c, $n, $stride);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGrams {
  private val space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int, stride: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val g = (m - n) / stride + 1
    val out = new Array[Any](g)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < g) {
      val base = i * stride
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(base + j); j += 1 }
      out(i) = if (n == 1) parts(0).copy() else UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
