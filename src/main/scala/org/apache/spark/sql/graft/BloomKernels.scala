package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(str)` against a Bloom filter carried as serialized
  * bytes — the broadcast-side membership pre-filter for join pruning (e.g.
  * decontamination: drop the ~100% of corpus n-grams that cannot match any
  * benchmark gram BEFORE the shuffle; Spark's own InjectRuntimeFilter does
  * the same with an internal expression this engine cannot call).
  *
  * The filter bytes ride the codegen references array (one copy per task
  * set, same transport as any literal); each generated class deserializes
  * once lazily. Probe hashing matches the builder
  * (`DataFrameStatFunctions.bloomFilter` inserts raw UTF-8 string bytes —
  * `mightContainBinary(getBytes)` is allocation-free on UTF8String).
  * Guaranteed no false negatives: every inserted value probes true, so an
  * exact verify join after the filter keeps results exact.
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = BloomMightContain.deserialize(bytes)

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bytes, "byte[]")
    val cls = classOf[BloomFilter].getName
    val helper = BloomMightContain.getClass.getName.stripSuffix("$") + ".deserialize"
    val bloomVar = ctx.addMutableState(cls, "bloomFilter")
    // deserialization goes through the Scala helper: BloomFilter.readFrom
    // declares a checked IOException, which generated Java cannot throw —
    // calling it directly makes Janino reject the WHOLE generated class and
    // the predicate silently drops to interpreted mode
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($bloomVar == null) {
         |  $bloomVar = $helper($bytesRef);
         |}
         |${ev.value} = $bloomVar.mightContainBinary($c.getBytes());""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Serialize a built filter once for embedding. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Checked-exception-free deserialization entry point for generated code
    * (Scala methods carry no `throws` clause).
    */
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
