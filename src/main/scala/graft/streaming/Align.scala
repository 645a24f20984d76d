package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event alignment: the stream-stream counterpart of the batch
  * as-of join (`PipelineQueries.asofJoin`) — watermarked interval join
  * between two live event streams.
  *
  * Streaming semantics differ deliberately from batch as-of: unbounded
  * "most recent prior" is not expressible with bounded state (a view from
  * arbitrarily long ago could always be the match), so the streaming form
  * bounds the lookback to `maxGap` and emits EVERY (purchase, view) pair
  * within it — candidate generation with provably bounded state (each
  * side's buffer is capped by watermark + gap). The reduce-to-latest step
  * runs wherever bounded batches exist again: the sink, a foreachBatch, or
  * the downstream batch job (`PipelineQueriesSpec` cross-checks exactly
  * this composition against the batch operator).
  *
  * Scale: state is hash-partitioned by the join key (user), each event is
  * buffered only until the opposing watermark passes `ts + maxGap`, and
  * late events beyond `watermarkDelay` drop instead of growing state.
  */
object Align {

  /** `left`/`right`: streaming DataFrames of (user_id, event_id, ts
    * TIMESTAMP). Emits (purchase_event_id, user_id, view_event_id, gap_us)
    * for every view in [purchase_ts − maxGap, purchase_ts].
    */
  def intervalCandidates(
      views: DataFrame,
      purchases: DataFrame,
      maxGap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermarkDelay)
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    p.join(v,
        expr(s"""v_user = p_user AND
                 v_ts <= p_ts AND
                 v_ts >= p_ts - interval $maxGap"""))
      .select(col("p_event").as("event_id"), col("p_user").as("user_id"),
        col("view_id"),
        ((unix_micros(col("p_ts"))) - unix_micros(col("v_ts"))).as("gap_us"))
  }
}
