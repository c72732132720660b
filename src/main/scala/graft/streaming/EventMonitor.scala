package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Structured-Streaming twin of `Relational.eventWindows` (SURVEY.md §7.6):
 * a continuous corrupt-row/error monitor over the events stream — windowed
 * per-type counts with a watermark for late data, plus an error-rate channel.
 *
 * Batch and stream share the same transformation (`transform(df)`), so the
 * monitor's logic is covered by the batch oracle while the streaming spec
 * covers watermarking/trigger mechanics via the memory sink.
 */
object EventMonitor {

  /** The shared (batch == stream) windowed aggregation. */
  def transform(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_errors"),
        sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("n_errors"), col("sum_value"))

  /** Start the monitor over a parquet directory as a file stream. The raw
    * schema carries `ts` in whatever encoding the fixture generation used
    * (ns longs or µs timestamps — see Tables.normalizeEventTs);
    * normalization to TimestampType happens inside the stream so batch and
    * stream share it.
    *
    * `outputMode` defaults to `append` — the production path: the watermark
    * evicts window state and drops late rows, so state stays bounded on an
    * unbounded stream. `complete` mode (which never evicts state) is only
    * for the finite-fixture twin comparison in [[runOnce]], where every
    * window must surface even though the watermark never passes the last one. */
  def start(spark: SparkSession, sfDir: String, queryName: String,
            outputMode: String = "append"): StreamingQuery = {
    val schema = graft.sources.Tables.eventsRawSchema(spark, sfDir)
    // FileStreamSource requires a directory path (it re-derives basePath per
    // batch), so stream the fixture dir and glob-filter to the events file.
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sfDir))
    transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /** Run the stream to exhaustion of available input, return the sink table.
    * Test-only twin comparison: complete mode so the final (pre-watermark)
    * windows are visible in the memory sink. */
  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    val q = start(spark, sfDir, "event_monitor_once", outputMode = "complete")
    try q.processAllAvailable() finally q.stop()
    spark.table("event_monitor_once")
  }
}
