package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface — the SURVEY §2.9/§2.12 north star. The
  * reference is strictly batch (pull-based iterators); on Spark the same
  * declarative operator catalog runs unmodified over unbounded input, and
  * these helpers add the streaming-only pieces: event-time windows,
  * watermarks, and session windows.
  *
  * Every function here takes and returns a plain DataFrame and builds an
  * identical logical plan for batch and streaming inputs — the batch runs
  * are what the unit tests and oracle can check, the streaming runs get
  * incremental execution + state store for free.
  *
  * Scale notes: windowed counts shuffle once on (window, key) with
  * map-side partial aggregation; the watermark bounds state size (late
  * data beyond the delay is dropped, closed windows are evicted). Session
  * windows use Spark's native `session_window` (state-store-backed gap
  * sessionization) rather than a hand-rolled
  * `flatMapGroupsWithState` — native windows keep whole-stage codegen and
  * AQE on the batch path.
  */
object Streaming {

  /** Tumbling-window count per key with a watermark. */
  def windowedEventCounts(
      events: DataFrame,
      tsField: String = "ts",
      keyField: String = "event_type",
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsField, watermarkDelay)
      .groupBy(window(col(tsField), windowLength), col(keyField))
      .agg(count(lit(1)).as("event_count"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyField),
        col("event_count"))

  /** Gap-based session windows per user: a session closes after
    * `gap` of event-time silence. */
  def sessionCounts(
      events: DataFrame,
      tsField: String = "ts",
      keyField: String = "user_id",
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsField, watermarkDelay)
      .groupBy(session_window(col(tsField), gap), col(keyField))
      .agg(count(lit(1)).as("event_count"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyField),
        col("event_count"))

  /** Unbounded parquet-directory source: new files under `dir` become
    * micro-batches. Schema must be supplied — a streaming source cannot
    * pay an inference pass per batch. */
  def readParquetStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
}
