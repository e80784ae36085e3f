package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det

/** Structured Streaming, SURVEY.md §2 #36.
  *
  * One aggregation definition serves both paths: the batch twin (oracle-
  * checked against DuckDB) and the streaming path (readStream + watermark,
  * exercised in ScalaTest through a memory source/sink). The watermark
  * bounds state: closed 1-hour windows are evicted after 2 hours of event
  * time, so state size is O(active windows × event types) regardless of
  * stream length.
  */
object EventStreams {

  /** Tumbling 1-hour event-time window aggregation (count + exact-cents
    * sum). Works on any events-shaped frame, batch or streaming. */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(Det.e2(col("value"))).cast("double") / lit(100.0)).as("v"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"), col("v"))

  /** #36 stream_window_agg — batch twin for the correctness gate. */
  def streamWindowAggBatch(s: SparkSession, dir: String): DataFrame =
    windowAgg(Tables.eventsMicros(s, dir)).orderBy("window_start", "event_type")

  /** Streaming path: watermarked version of the same aggregation. Feed it
    * a `readStream` frame (or a MemoryStream in tests) and attach a sink. */
  def streamWindowAgg(events: DataFrame): DataFrame =
    windowAgg(events.withWatermark("ts", "2 hours"))
}
