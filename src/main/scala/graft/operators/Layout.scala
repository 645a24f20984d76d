package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * scan pruning, the columnar-era successor of the reference's sorted-run
  * LSM layout (sorted SSTables prune by ONE key; a space-filling curve
  * clusters by SEVERAL at once — Delta/Iceberg's OPTIMIZE ZORDER is the
  * public reference shape).
  *
  * Why it matters at 100 TB: parquet skips row groups via column min/max
  * stats, but stats only prune if writes CLUSTER the filtered columns.
  * Range-partitioning + sorting by the interleaved-bit key gives every file
  * a compact rectangle in (c1, c2) space, so a selective predicate on
  * EITHER z-column (or both) touches a small fraction of files — without
  * duplicating the data per sort key.
  *
  * Everything is exact integer arithmetic on native columns (shifts, masks,
  * ors, integral division — fully codegen, no UDF), so the key is
  * engine-replayable and the same construction is emitted as ANSI SQL for
  * the oracle gate.
  */
object Layout {

  /** Bits kept per dimension; 2 dims × 16 bits fill 32 bits of the key —
    * plenty of resolution for file-level clustering (a 100 TB table has
    * ~10⁶ files; 2³² cells ≫ that).
    */
  val BitsPerDim = 16

  /** Spread the low 16 bits of `x` so bit i lands at position 2i (the
    * classic mask-shift cascade; every step is exact long arithmetic).
    */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  private def spread16Sql(x: String): String = {
    val a = s"($x & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  /** Overflow-free divisor mapping the domain [min, max] into [0, 65535]:
    * (v−min) div ((span div 65536) + 1) — never multiplies, and
    * (D div (D div 65536 + 1)) < 65536 for every D ≥ 0. The span is
    * computed in BigInt: a full-range SIGNED domain (e.g. raw xxhash64
    * ids, min ≈ −2⁶³) overflows `max − min` in long arithmetic, which
    * would produce a zero/negative divisor (ANSI divide-by-zero at best,
    * silently garbage keys at worst). Domains whose span itself exceeds
    * int64 are pre-halved — see `normCol`.
    */
  private[operators] def span(min: Long, max: Long): BigInt =
    BigInt(max) - BigInt(min)

  private[operators] def normDivisor(min: Long, max: Long): Long = {
    val s = span(min, max)
    // CEILING halving: (max>>1 − min>>1) can reach ⌈span/2⌉ when the span
    // is odd, and the <65536 bound needs divisor ≥ floor(maxInput/65536)+1
    val halved = if (s > Long.MaxValue) (s + 1) / 2 else s
    (halved / 65536 + 1).toLong
  }

  /** Exact integral division (Column `/` is double division — silently
    * lossy past 2^53; same fix as RangeJoin.floorDiv). Operands here are
    * non-negative, so IntegralDivide IS the floor.
    */
  private def idiv(c: Column, d: Long): Column =
    Bridge.column(new IntegralDivide(
      Bridge.expression(c), Bridge.expression(lit(d))))

  /** (v − min) needs the same care: when the span exceeds int64, both v
    * and min are arithmetic-shifted right first (floor halving — monotone,
    * exact), after which the difference and the divisor both fit. The
    * halved path costs one bit of resolution out of 63 — irrelevant at 16
    * output bits.
    */
  private def normCol(v: Column, min: Long, max: Long): Column =
    if (span(min, max) > Long.MaxValue)
      idiv(shiftright(v, 1) - lit(min >> 1), normDivisor(min, max))
    else idiv(v - lit(min), normDivisor(min, max))

  private def normSql(v: String, min: Long, max: Long): String =
    if (span(min, max) > Long.MaxValue)
      s"((($v >> 1) - (${min >> 1})) // ${normDivisor(min, max)})"
    else s"(($v - ($min)) // ${normDivisor(min, max)})"

  /** The 2-D Morton key of (c1, c2) over the given inclusive domains:
    * interleaved bits, c1 on even positions. Inputs must be integral.
    */
  def zkey2(c1: Column, d1: (Long, Long), c2: Column, d2: (Long, Long)): Column =
    spread16(normCol(c1, d1._1, d1._2))
      .bitwiseOR(shiftleft(spread16(normCol(c2, d2._1, d2._2)), 1))

  /** The same key as DuckDB SQL (`//` = floor division; operands are
    * non-negative after the min subtraction, so floor ≡ integral).
    */
  def zkey2Sql(c1: String, d1: (Long, Long), c2: String, d2: (Long, Long)): String =
    s"(${spread16Sql(normSql(c1, d1._1, d1._2))} | " +
      s"(${spread16Sql(normSql(c2, d2._1, d2._2))} << 1))"

  /** SQL variant with the domain endpoints as SQL EXPRESSIONS (e.g. columns
    * of a min/max CTE) instead of precomputed constants — the oracle's
    * replay computes the domain in the same query. The divisor formula is
    * the Scala one verbatim; `//` floors and every operand is non-negative.
    */
  def zkey2SqlDyn(c1: String, min1: String, max1: String,
      c2: String, min2: String, max2: String): String = {
    def norm(v: String, mn: String, mx: String) =
      s"(($v - $mn) // ((($mx - $mn) // 65536) + 1))"
    s"(${spread16Sql(norm(c1, min1, max1))} | " +
      s"(${spread16Sql(norm(c2, min2, max2))} << 1))"
  }

  /** Z-order `df` by two integral columns: one tiny agg pass computes the
    * domains, then range-partition + in-partition sort by the Morton key.
    * `files` bounds the output width (at real scale: size so each file is
    * ~0.5–1 GB). The returned frame is what a writer should persist; the
    * key column is dropped — it is derivable, not data.
    *
    * Scale: the domain agg is a full-scan-but-tiny-result pass (min/max
    * combine map-side); the layout itself is ONE range shuffle — the same
    * cost as any global sort, amortized over every pruned read after it.
    */
  def zorder2(df: DataFrame, col1: String, col2: String, files: Int): DataFrame = {
    val r = df.agg(
      min(col(col1).cast("long")), max(col(col1).cast("long")),
      min(col(col2).cast("long")), max(col(col2).cast("long"))).first()
    require(!r.isNullAt(0) && !r.isNullAt(2), "zorder2 on an empty frame")
    val k = zkey2(col(col1).cast("long"), (r.getLong(0), r.getLong(1)),
      col(col2).cast("long"), (r.getLong(2), r.getLong(3)))
    df.withColumn("__zkey", k)
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
