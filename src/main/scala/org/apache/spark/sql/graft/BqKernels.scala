package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen kernels for the binary-quantization (BQ) tier: 1 BIT per
  * dimension — 32× smaller than float32 (the most aggressive recall-per-byte
  * point of the quantizer family; faiss `IndexBinaryFlat` is the public
  * reference shape). A 100 TB float corpus scans ~3 TB of sign codes, and
  * the scan kernel is XOR + POPCNT — no float math at all until the exact
  * re-rank stage.
  */

/** `bq_encode(vector ARRAY<FLOAT>, thresholds ARRAY<FLOAT>)` → BINARY of
  * ceil(dim/8) bytes: bit i (byte i/8, mask 1<<(i%8)) is set iff
  * v[i] > thr[i]. Dimension mismatch is a loud error (P3 validation, same
  * contract as the SQ/PQ encoders).
  */
case class BqEncode(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bq_encode"

  override protected def nullSafeEval(v: Any, th: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val thr = th.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    if (thr.numElements() != dim)
      throw new IllegalArgumentException(
        s"vector dimension $dim != model dimension ${thr.numElements()}")
    val out = new Array[Byte]((dim + 7) / 8)
    var i = 0
    while (i < dim) {
      if (vec.getFloat(i) > thr.getFloat(i))
        out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, th) => {
      val dim = ctx.freshName("dim"); val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""int $dim = $v.numElements();
         |if ($th.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "vector dimension " + $dim + " != model dimension " + $th.numElements());
         |}
         |byte[] $out = new byte[($dim + 7) / 8];
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($v.getFloat($i) > $th.getFloat($i)) {
         |    $out[$i >> 3] = (byte) ($out[$i >> 3] | (1 << ($i & 7)));
         |  }
         |}
         |${ev.value} = $out;""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `bq_hamming(a BINARY, b BINARY)` → INT: popcount of the byte-wise XOR —
  * the symmetric Hamming distance between two packed sign codes (both sides
  * encode; there is no useful asymmetric form for 1-bit codes). Length
  * mismatch is a loud error.
  */
case class BqHamming(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bq_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"code length ${x.length} != ${y.length}")
    var s = 0; var i = 0
    while (i < x.length) {
      s += java.lang.Integer.bitCount((x(i) ^ y(i)) & 0xFF)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""if ($a.length != $b.length) {
         |  throw new IllegalArgumentException(
         |    "code length " + $a.length + " != " + $b.length);
         |}
         |int $s = 0;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $s += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xFF);
         |}
         |${ev.value} = $s;""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
