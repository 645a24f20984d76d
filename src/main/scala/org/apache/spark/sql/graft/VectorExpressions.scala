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

  /** Bulk-extract both sides to primitive float[] and dimension-check.
    *
    * The loops themselves live in `graft.kernels.VecKernels` — static,
    * compiled ONCE per JVM — and both the interpreted eval and the
    * generated code call the same method. Two reasons, both measured on the
    * 125M-pair KNN crossJoin at 1.25M corpus rows:
    *  - per-element `ArrayData.getFloat(i)` in the hot loop is a
    *    megamorphic virtual call (UnsafeArrayData / ColumnarArray /
    *    GenericArrayData receivers), so extraction happens once per pair
    *    via `toFloatArray()` (an intrinsic bulk copy for unsafe data);
    *  - a loop INLINED into the whole-stage-generated method inherits that
    *    class's cold JIT profile and its C2 deopt churn — observed as an
    *    `unstable_if` reinterpret storm that held the scan at interpreter
    *    speed (~97 cycles/element, 5× the handcrafted mapPartitions floor).
    *    The static kernel keeps one warm profile across queries and tasks.
    */
  protected final def dims(x: ArrayData, y: ArrayData): (Array[Float], Array[Float]) = {
    val xa = x.toFloatArray(); val ya = y.toFloatArray()
    if (xa.length != ya.length) {
      throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${xa.length} vs ${ya.length})")
    }
    (xa, ya)
  }

  /** Codegen twin of `dims`: primitive extraction + guard. */
  protected final def genDimCheck(n: String, xa: String, ya: String, x: String, y: String): String =
    s"""float[] $xa = $x.toFloatArray();
       |float[] $ya = $y.toFloatArray();
       |int $n = $xa.length;
       |if ($n != $ya.length) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: vector dimensions differ (" + $n + " vs " + $ya.length + ")");
       |}""".stripMargin
}

/** Squared euclidean distance — no sqrt, ordering-equivalent to L2
  * (reference `internal/index/distance.go:33-39`; L2((1,2,3),(4,5,6)) = 27).
  */
case class L2Sq(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, ya) = dims(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    graft.kernels.VecKernels.l2sq(xa, ya)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa"); val ya = ctx.freshName("ya")
      s"""${genDimCheck(n, xa, ya, x, y)}
         |${ev.value} = graft.kernels.VecKernels.l2sq($xa, $ya);""".stripMargin
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
    val (xa, ya) = dims(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    graft.kernels.VecKernels.negDot(xa, ya)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa"); val ya = ctx.freshName("ya")
      s"""${genDimCheck(n, xa, ya, x, y)}
         |${ev.value} = graft.kernels.VecKernels.negDot($xa, $ya);""".stripMargin
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
    val (xa, ya) = dims(x, y)
    graft.kernels.VecKernels.cosDist(xa, ya)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa"); val ya = ctx.freshName("ya")
      s"""${genDimCheck(n, xa, ya, x, y)}
         |${ev.value} = graft.kernels.VecKernels.cosDist($xa, $ya);""".stripMargin
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
    val (xa, ya) = dims(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    graft.kernels.VecKernels.hammingNe(xa, ya)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa"); val ya = ctx.freshName("ya")
      s"""${genDimCheck(n, xa, ya, x, y)}
         |${ev.value} = graft.kernels.VecKernels.hammingNe($xa, $ya);""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

