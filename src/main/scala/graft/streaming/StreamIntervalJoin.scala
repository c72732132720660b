package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Stream-stream interval join — the continuous twin of
 * [[graft.operators.IntervalJoin.intervalQuery]]: as events arrive, attach
 * every event to the error events of the same user whose 30-minute blast
 * radius contains it ("activity in an incident's window", live).
 *
 * This is Spark's watermarked stream-stream inner join: both sides carry a
 * watermark and the join condition bounds each side's event time relative
 * to the other (`l.ts ∈ [r.ts, r.ts + 30 min)`), which is exactly what the
 * state store needs to evict — left rows older than the watermark can
 * never match a future error, and error rows older than watermark + 30 min
 * can never match a future event. State is therefore bounded by the
 * watermark horizon × arrival rate, not by stream length — the property
 * that lets this run forever on an unbounded stream.
 *
 * Batch and stream share `transform`, so the join's semantics are covered
 * by the `q_interval_join` oracle while the streaming spec covers the
 * watermark/state mechanics via the memory sink. (The batch operator plans
 * the same predicate through the granule-exploded equi-join shape instead;
 * see IntervalJoin's scaladoc for why that wins at rest.)
 */
object StreamIntervalJoin {

  /** The shared (batch == stream) join: events × same-user error windows.
    * `events` may be a streaming or a batch frame.
    *
    * `joinType` extends to the watermarked outer forms:
    *  - `left_outer`: events matching no error window emit once with a
    *    NULL `error_id` — but only after the watermark passes their last
    *    possible match (the state store must PROVE no future error can
    *    still claim them), so on a drained finite input the trailing
    *    horizon's unmatched rows stay buffered. Specs therefore assert
    *    the stable contract: the non-null slice equals the inner join,
    *    and every null row is a true batch non-match — not that every
    *    non-match has surfaced.
    *  - `full_outer`: additionally, error windows that no event landed in
    *    emit once with NULL event columns under the same
    *    watermark-proven rule. On THIS query's self-feeding shape every
    *    error event is also a left-side event that lands in its own
    *    window, so fixture runs produce an empty right-null slice — the
    *    spec pins that property and exercises real right-padding through
    *    [[transformStreams]] over two independent synthetic streams.
    *
    * `user_id` is coalesced across sides so right-padded rows keep the
    * error's user (for matched and left-padded rows the coalesce is the
    * left value, unchanged). */
  def transform(events: DataFrame, joinType: String = "inner"): DataFrame =
    transformStreams(events, events.filter(col("event_type") === "error"),
      joinType)

  /** The two-stream general form: `events` and `errors` may be ANY two
    * (streaming or batch) frames with (event_id, user_id, ts) — the
    * self-feeding [[transform]] is the special case `errors = events
    * WHERE event_type = 'error'`. Note that on the self-feeding shape a
    * right-padded row is IMPOSSIBLE even under drops: the join condition
    * gives both sides the same state watermark (watermark − 30 min), so
    * an error's left twin survives exactly as long as the error itself
    * and always self-matches — right-padding only arises when the two
    * sides are genuinely independent streams, which is what the spec
    * feeds. */
  def transformStreams(events: DataFrame, errors: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val l = events
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "1 hour")
    val r = errors
      .select(col("event_id").as("error_id"), col("user_id").as("_ruid"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", "1 hour")
    l.join(r,
        col("user_id") === col("_ruid") &&
          col("ts") >= col("err_ts") &&
          col("ts") < col("err_ts") + expr("INTERVAL 30 MINUTES"),
        joinType)
      .select(
        col("event_id"),
        coalesce(col("user_id"), col("_ruid")).as("user_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        col("error_id"))
  }

  /** Start the join over the fixture dir as a file stream (same source
    * shape as [[EventMonitor.start]]); append mode — each match emits
    * exactly once, state evicted by the watermark. */
  def start(spark: SparkSession, sfDir: String, queryName: String,
      joinType: String = "inner"): StreamingQuery = {
    val schema = graft.sources.Tables.eventsRawSchema(spark, sfDir)
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sfDir))
    transform(stream, joinType).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /** Run to exhaustion of available input, return the sink table. */
  def runOnce(spark: SparkSession, sfDir: String,
      joinType: String = "inner"): DataFrame = {
    val name = s"stream_interval_join_once_$joinType"
    val q = start(spark, sfDir, name, joinType)
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
