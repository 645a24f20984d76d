package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated TESTDATA parquet tables. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table with `ts` normalized to BIGINT nanoseconds since
    * epoch — the clock every downstream query does exact long arithmetic
    * on. The driver has shipped the column as both parquet TIMESTAMP(NANOS)
    * (readable as int64 only under the legacy nanosAsLong flag) and plain
    * TIMESTAMP(MICROS) (arriving as TIMESTAMP_NTZ/TIMESTAMP); this loader
    * accepts all three encodings and lands on the same nanos ticks DuckDB's
    * `epoch_ns(ts)` sees, so oracle arithmetic replays exactly. NTZ wall
    * clocks are interpreted in the session timezone (engines pin UTC),
    * matching DuckDB's naive-timestamp epoch functions.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df // nanos-annotated int64 under the legacy flag
      case TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.ts: expected nanos int64 or a timestamp type, got $other")
    }
  }
}
