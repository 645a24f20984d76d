package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture primitive between two
  * corpus/state versions (yesterday's crawl vs today's, checkpoint N vs
  * N+1): classify every id as added / removed / changed / unchanged from a
  * full outer join on the key.
  *
  * Scale: one co-partitioned full outer join (both sides shuffle on the
  * SAME key, or none at all when both snapshots are bucketed/clustered on
  * id — see Layout); comparison is a row-local struct equality, no state.
  * `unchanged` rows — the overwhelming majority between adjacent
  * snapshots — are dropped BEFORE anything downstream, so the emitted
  * delta is proportional to churn, not corpus size.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on `idCol`, comparing `compareCols`.
    * Output: id, status ('added' | 'removed' | 'changed'), and the
    * old_/new_ prefixed compare columns (null on the absent side).
    * Unchanged ids are omitted. Inputs must be key-unique snapshots.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = oldDf.select(col(idCol).as("__id"),
      struct(compareCols.map(col): _*).as("__old"))
    val n = newDf.select(col(idCol).as("__id"),
      struct(compareCols.map(col): _*).as("__new"))
    val joined = o.join(n, Seq("__id"), "full_outer")
    val status = when(col("__old").isNull, lit("added"))
      .when(col("__new").isNull, lit("removed"))
      .when(col("__old") =!= col("__new"), lit("changed"))
    joined
      .withColumn("status", status)
      .filter(col("status").isNotNull) // unchanged → null → dropped
      .select(Seq(col("__id").as(idCol), col("status")) ++
        compareCols.map(c => col(s"__old.$c").as(s"old_$c")) ++
        compareCols.map(c => col(s"__new.$c").as(s"new_$c")): _*)
  }
}
