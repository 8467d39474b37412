package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (`event_id, ts, user_id,
  * event_type, value, props`), written so the same expressions run in batch
  * (DuckDB-checkable) and under Structured Streaming (see
  * [[graft.streaming.StreamingEvents]] for the readStream/watermark
  * wrappers).
  *
  * Windowed aggregations use Spark's `window()` — a per-row expression that
  * assigns bucket(s) then hash-aggregates on (window, keys): one shuffle,
  * partial aggregation on the map side, no sorting. Sessionization uses a
  * per-user window — partitioned by user_id, so it scales with user
  * cardinality, never funneling through one partition.
  */
object EventOps {

  /** Tumbling-window aggregation: count + exact sum(value) per (window,
    * event_type). `value` carries 2 decimals → decimal sum is exact and
    * order-independent (see RelationalOps.decSum).
    */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), RelationalOps.decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Sliding-window aggregation (width/slide): each event lands in
    * width/slide buckets; Spark's window() emits them as a generator —
    * still one shuffle on (window, keys).
    */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), RelationalOps.decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gap`. Batch implementation: per-user ordered window, lag →
    * session-start flags → running sum = session index. (The streaming
    * equivalent is `session_window`/flatMapGroupsWithState — same
    * semantics.) Deterministic ordering via (ts, event_id) tiebreak.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 10): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    val isNew = when(prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > gapMinutes * 60L * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("session_idx", sum(isNew).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** Per-user session summary: session count + mean events/session (exact
    * integer arithmetic → deterministic double division).
    */
  def sessionSummary(events: DataFrame, gapMinutes: Int = 10): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        (sum(col("n_events")).cast("double") / count(lit(1))).as("avg_session_events"))
}
