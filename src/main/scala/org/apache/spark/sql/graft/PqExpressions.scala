package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen kernels for the IVF/PQ scan paths (SURVEY A4/J3) — native
  * expressions instead of UDFs, so the per-row work stays inside
  * whole-stage codegen with no serialization boundary.
  */

/** `adc_lookup_sum(codes ARRAY<INT>, table ARRAY<FLOAT>)` → DOUBLE:
  * Σ_j table[j·k + codes[j]] where k = |table| / |codes| — the ADC
  * distance-table scoring of `ivfpq.go:259-285`, with the per-(query,list)
  * table carried as a row value from the broadcast probe join.
  */
case class AdcLookupSum(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup_sum"

  override protected def nullSafeEval(c: Any, t: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]; val table = t.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val k = table.numElements() / m
    var s = 0.0; var j = 0
    while (j < m) { s += table.getFloat(j * k + codes.getInt(j)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val m = ctx.freshName("m"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      s"""int $m = $c.numElements();
         |int $k = $t.numElements() / $m;
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $s += $t.getFloat($j * $k + $c.getInt($j));
         |}
         |${ev.value} = $s;""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `nearest_centroid(vector ARRAY<FLOAT>, centroids ARRAY<ARRAY<FLOAT>>)` →
  * INT: argmin of squared-L2 distance (ties → lowest index) — the
  * centroid-assignment join J3 as a broadcast-free codegen kernel; the
  * centroid table rides in as a literal.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(v: Any, cs: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]; val cents = cs.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    val n = cents.numElements()
    while (c < n) {
      val ct = cents.getArray(c)
      var s = 0.0; var i = 0
      while (i < dim) {
        val d = vec.getFloat(i).toDouble - ct.getFloat(i).toDouble
        s += d * d; i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val dim = ctx.freshName("dim"); val n = ctx.freshName("n")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d"); val ct = ctx.freshName("ct")
      s"""int $dim = $v.numElements();
         |int $n = $cs.numElements();
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $n; $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $ct = $cs.getArray($c);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $d = (double) $v.getFloat($i) - (double) $ct.getFloat($i);
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $best = $c; }
         |}
         |${ev.value} = $best;""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
