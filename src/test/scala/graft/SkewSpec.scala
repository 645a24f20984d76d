package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** `Skew.spreadByKey` — the explicit keyed repartition under the session
  * windows (see RelationalQueries.sessionize): rows preserved exactly, the
  * partition count is the scale-adaptive max(defaultParallelism,
  * shuffle.partitions) AQE may not coalesce, and co-keyed rows stay
  * co-partitioned so the window above reuses the exchange.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("spreadByKey: rows preserved, explicit width, co-keyed rows co-partitioned") {
    val df = (1 to 10000).map(i => (s"u${i % 7}", i)).toDF("k", "v")
    val spread = Skew.spreadByKey(df, Seq("k"))

    // exact row preservation (a repartition must never drop or duplicate)
    assert(spread.as[(String, Int)].collect().sorted.toSeq ===
      df.as[(String, Int)].collect().sorted.toSeq)

    val expected = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val parts = spread.select(col("k"),
        expr("spark_partition_id()").as("p"))
      .distinct().collect().map(r => (r.getString(0), r.getInt(1)))
    // the explicit count binds (AQE byte-coalescing would have shrunk a
    // ~100 KB exchange to 1 task — the serialization spreadByKey exists
    // to prevent)
    assert(spread.rdd.getNumPartitions === expected)
    // hash-partitioned BY THE KEY: every key lives in exactly one partition
    assert(parts.groupBy(_._1).values.forall(_.length === 1))
  }
}
