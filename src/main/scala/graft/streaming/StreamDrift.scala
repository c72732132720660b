package graft.streaming

import graft.operators.DriftMonitor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming corpus-drift monitor — the ingest-time half of
 * [[DriftMonitor]]: an arriving document stream is banded with the SAME
 * band expression as the batch operator, per-band counts accumulate in a
 * streaming aggregation (complete mode — state is one row per band, a
 * BOUNDED set by construction), and each micro-batch's cumulative
 * histogram is scored against the static reference histogram with the
 * same log-free statistic. The alert decision (drift over threshold) is
 * the sink's to make; this operator owns the measurement.
 *
 * State shape: #bands rows total, independent of stream length — the
 * smallest stateful footprint a distribution monitor can have. The
 * reference histogram is static (the state is the baseline, as
 * StreamHygiene's eval set is its state).
 */
object StreamDrift {

  /**
   * Start monitoring `docs` (streaming frame with an `n_chars` column)
   * against `reference` (batch frame, same schema). `sink` receives the
   * per-band drift frame of [[DriftMonitor.snapshotDrift]] for each
   * micro-batch, computed over the cumulative stream histogram.
   */
  def start(
      docs: DataFrame,
      reference: DataFrame,
      bandWidth: Int = 100,
      maxBand: Int = 19,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // the reference histogram is computed ONCE and checkpointed — the
    // static baseline every micro-batch scores against
    val refCounts = reference
      .withColumn("band", DriftMonitor.lengthBand(bandWidth, maxBand))
      .groupBy("band").agg(count(lit(1)).as("n_b"))
      .localCheckpoint(true)
    val counts = docs
      .withColumn("band", DriftMonitor.lengthBand(bandWidth, maxBand))
      .groupBy("band").count()
    counts.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // the cumulative histogram feeds the batch scorer directly
        sink(DriftMonitor.driftFromCounts(
          batch.select(col("band"), col("count").as("n_a")), refCounts), id)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
