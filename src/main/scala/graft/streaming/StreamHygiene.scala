package graft.streaming

import graft.operators.CorpusPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming corpus hygiene — the ingest-time half of the cleaning
 * pipeline, for a corpus that arrives as a stream:
 *
 *  - the NARROW gates (quality score, language allowlist, repetition
 *    fractions) are plain row filters, so they run natively on the stream
 *    — no state, no watermark, full codegen ([[CorpusPipeline.preFilter]]
 *    applied to an unbounded frame);
 *  - the decontamination probe runs inside `foreachBatch`, reusing the
 *    batch operator verbatim: each micro-batch broadcast-joins the
 *    benchmark-bounded eval gram set exactly like the batch path, so
 *    there is no streaming state at all — the eval set is the state, and
 *    it is static;
 *  - cross-batch exact dedup composes UPSTREAM via [[StreamDedup]]
 *    (watermark-bounded), and cross-batch near-dup belongs to
 *    [[graft.operators.IncrementalDedup]] against the cell-store index —
 *    each stage owns the state shape it needs and nothing more.
 *
 * Exactly-once: batch-level, from the checkpoint's replay contract — the
 * same contract [[CellStoreIngest]] documents (a replayed batch re-runs
 * the same pure transformation).
 */
object StreamHygiene {

  /**
   * Start cleaning `docs` (streaming frame with doc_id/text/lang columns):
   * narrow gates on the stream, per-batch decontamination, then `sink`.
   */
  def start(
      docs: DataFrame,
      evalSet: DataFrame,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config(),
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val gated = CorpusPipeline.preFilter(docs, cfg)
    gated.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(CorpusPipeline.decontaminate(batch, evalSet, cfg.decontamN), id)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
