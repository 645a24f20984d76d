package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.core.SpaceType

/** Native Catalyst expressions for the reference's distance family
  * (`internal/index/distance.go:7-39`, C++ `space_l2.h`/`space_ip.h`) —
  * see SURVEY.md §2.6 F1–F5.
  *
  * Design notes:
  *  - Inputs are `ARRAY<FLOAT>` (the reference's `[]float32`); accumulation is
  *    in double so results are bit-identical to an oracle that casts the same
  *    float values to double and folds left-to-right.
  *  - All expressions implement `doGenCode`, so KNN distance projections stay
  *    inside whole-stage codegen (no UDF/serialization in the hot path).
  *  - Mismatched dimensions throw (reference validates dimension on every
  *    write/search, `internal/db/document.go:71-73` — SURVEY P3).
  */
abstract class VectorBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  protected final def dims(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${n} vs ${y.numElements()})")
    }
    n
  }

  /** Codegen guard shared by all subclasses. */
  protected final def genDimCheck(n: String, x: String, y: String): String =
    s"""int $n = $x.numElements();
       |if ($n != $y.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: vector dimensions differ (" + $n + " vs " + $y.numElements() + ")");
       |}""".stripMargin
}

/** Squared euclidean distance — no sqrt, ordering-equivalent to L2
  * (reference `internal/index/distance.go:33-39`; L2((1,2,3),(4,5,6)) = 27).
  */
case class L2Sq(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = dims(x, y)
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""${genDimCheck(n, x, y)}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Negative inner product (reference `internal/index/distance.go:7-13`:
  * ip((1,2,3),(1,2,3)) = −14). Smaller = more similar, so top-k by ascending
  * distance works uniformly across spaces.
  */
case class NegDot(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "neg_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = dims(x, y)
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    -s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""${genDimCheck(n, x, y)}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = -$s;""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine distance: 1 − dot/(‖a‖·‖b‖); zero-norm convention → 1.0
  * (reference `internal/index/distance.go:14-24`).
  */
case class CosDist(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cos_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = dims(x, y)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""${genDimCheck(n, x, y)}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $x.getFloat($i);
         |  double $yv = (double) $y.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 1.0 : 1.0 - $dot / java.lang.Math.sqrt($na * $nb);""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance over float elements: count of positions where elements
  * differ under float `!=` (reference `internal/index/distance.go:25-32`).
  */
case class HammingNe(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_ne"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = dims(x, y)
    var c = 0L; var i = 0
    while (i < n) { if (x.getFloat(i) != y.getFloat(i)) c += 1L; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val c = ctx.freshName("c")
      s"""${genDimCheck(n, x, y)}
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getFloat($i) != $y.getFloat($i)) $c++;
         |}
         |${ev.value} = $c;""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

