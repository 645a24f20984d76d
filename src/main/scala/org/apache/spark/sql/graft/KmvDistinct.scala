package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded KMV (k-minimum-values) distinct-count sketch buffer: the k
  * smallest DISTINCT 60-bit hash values seen so far (Bar-Yossef et al. 2002;
  * the theta-sketch family's simplest member). O(k) memory, O(log k) per
  * update, and union-mergeable — the shape a distributed COUNT DISTINCT
  * estimate needs: map tasks ship ≤ k longs per group to the exchange
  * instead of the full value set.
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last()) {
      if (set.add(h)) { set.pollLast(); () }
    }
  }

  def mergeFrom(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
  }
}

/** `kmv_distinct(value, k)` → STRUCT<n_minima BIGINT, kth_min BIGINT,
  * est DOUBLE>: a deterministic, ORACLE-REPLAYABLE distinct-count sketch.
  *
  * The per-value hash is the first 15 hex nibbles of md5 (a 60-bit uniform
  * value) — the one hash Spark and external SQL engines share, so an
  * external engine can replay the sketch EXACTLY: same k minima, same k-th
  * minimum, same estimate to the last bit. (Spark's own
  * `approx_count_distinct` HLL++ has no such replay — its estimate is
  * gate-able only within tolerance.)
  *
  * Estimator: with fewer than k distinct hashes the sketch is exhaustive —
  * est = n_minima exactly; otherwise est = (k−1)·2⁶⁰ / v_k with v_k the
  * k-th smallest hash (relative error ~1/√(k−2)). Both branches are single
  * exact double operations on integers, so the emitted DOUBLE hash-matches
  * the oracle's.
  */
case class KmvDistinct(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with ImplicitCastInputTypes {

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(value)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_minima", LongType, nullable = false),
    StructField("kth_min", LongType, nullable = false),
    StructField("est", DoubleType, nullable = false)))

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = value.eval(input)
    if (v != null) buf.insert(KmvDistinct.hash60(v.asInstanceOf[UTF8String].getBytes))
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeFrom(other); buf
  }

  private val pow60 = 1152921504606846976.0 // 2^60, exact in double

  override def eval(buf: KmvBuffer): Any = {
    val n = buf.set.size.toLong
    val kth = if (buf.set.isEmpty) 0L else buf.set.last().longValue()
    val est =
      if (n < k) n.toDouble // sketch is exhaustive below k
      else (k - 1).toDouble * pow60 / kth.toDouble
    InternalRow(n, kth, est)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.insert(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  // executor-side only; lives in the companion so the case class stays
  // serializable (a ThreadLocal field would ride the task closure)
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5 = first 8 bytes big-endian >>> 4 — the
    * shared 60-bit replayable hash of the KMV sketch family.
    */
  private[graft] def hash60(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** `kmv_minima(value, k)` → ARRAY<BIGINT>: the raw KMV sketch — the k
  * smallest DISTINCT 60-bit md5-prefix hashes, ascending. Exposing the
  * minima SET (rather than `KmvDistinct`'s scalar summary) is what makes
  * the sketch COMPOSABLE: theta-sketch set algebra (union / intersection /
  * Jaccard between groups) runs as plain array expressions on the
  * constant-width sketch frame, executor-side, long after the corpus-sized
  * input is gone. Same buffer, same hash, same mergeability — and the same
  * exact DuckDB replay, since the array is a deterministic function of the
  * value set.
  */
case class KmvMinima(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with ImplicitCastInputTypes {

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(value)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = value.eval(input)
    if (v != null) buf.insert(KmvDistinct.hash60(v.asInstanceOf[UTF8String].getBytes))
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: KmvBuffer): Any = {
    // TreeSet iterates ascending — emit in that order
    val arr = new Array[Long](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.insert(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvMinima =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMinima =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
  override def prettyName: String = "kmv_minima"
}
