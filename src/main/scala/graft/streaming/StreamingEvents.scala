package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.ops.RelationalOps

/** Structured Streaming wrappers for the event analytics in
  * [[graft.ops.EventOps]]: the same windowed aggregation expressions run
  * over a `readStream` source with watermark-bounded state.
  *
  * Design (SURVEY.md §2.11): the reference is pure batch, so this is
  * extension-tier. Batch (`EventOps`) and streaming share the aggregation
  * shape — `window()` bucketing + hash aggregation keyed on
  * (window, event_type) — so results are consistent between a backfill
  * (batch over parquet) and the live stream. The watermark bounds state:
  * windows older than (max event time − watermark) are finalized and
  * evicted, so state size is O(active windows × key cardinality), not
  * O(stream length) — the property that matters at 100 TB/day.
  */
object StreamingEvents {

  /** Schema of the events stream (`ts` already micros-typed). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-based stream over a directory of event files (the standard
    * landing-zone pattern: new files appear, Spark picks them up
    * incrementally with exactly-once tracking in the checkpoint).
    */
  def readEventStream(spark: SparkSession, dir: String,
                      format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(dir)

  /** Tumbling-window count+sum with watermark-bounded state. Append mode
    * emits each window exactly once, after the watermark passes its end.
    */
  def tumbling(events: DataFrame, width: String = "1 hour",
               watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), RelationalOps.decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Sliding-window variant — each event lands in width/slide windows. */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes",
              watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), RelationalOps.decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Gap-based streaming sessionization via `session_window` — the
    * streaming-native equivalent of [[graft.ops.EventOps.sessionize]]'s
    * batch lag/running-sum construction. State is one open session per
    * (user, gap-window), closed and emitted once the watermark passes.
    */
  def sessionized(events: DataFrame, gap: String = "10 minutes",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup with bounded state: keeps one row per key,
    * holding each key's state only while a duplicate could still arrive
    * under the watermark (`dropDuplicatesWithinWatermark`), so state is
    * O(keys per watermark window), not O(stream length). The streaming
    * counterpart of [[graft.ops.DedupOps.exactDedup]] — dedup a live
    * document/event feed by content digest before it lands. The caller
    * picks the key columns (e.g. a content md5 for documents, event_id
    * for events).
    */
  def dedupedWithinWatermark(events: DataFrame, keyCols: Seq[String],
                             watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Standard sink wiring: append-mode parquet with a checkpoint. */
  def writeParquet(df: DataFrame, outDir: String,
                   checkpointDir: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
}
