package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Coordinated model swap for the live vector service — the one
 * maintenance step [[VectorIngest]] (write half) and [[StreamAnnServe]]
 * (read half) cannot do alone: a rebuild retrains the centroids, and
 * BOTH streams hold the old model frozen, so the swap must drain and
 * stop them, commit the retrained generation, and hand the NEW model to
 * the restarted streams.
 *
 * Safety comes from two independent layers:
 *  - the rebuild itself is crash-atomic (one rename flips the base
 *    generation — a kill at any point leaves a readable index), and
 *  - the generation carries the new model's FINGERPRINT, so any stream
 *    that was missed by the coordination (or restarted with the stale
 *    model out of operator error) fails [[IvfIndex.requireModelMatches]]
 *    loudly on its next search or append instead of silently probing
 *    the wrong cells. The coordination makes the swap clean; the stamp
 *    makes a botched swap IMPOSSIBLE to miss.
 *
 * Drain-then-stop: `processAllAvailable()` flushes every already-queued
 * micro-batch through the old model (their slices commit under the old
 * generation and are FOLDED by the rebuild — nothing is lost), then
 * `stop()` ends the stream. Resuming ingest on the SAME checkpoint
 * continues the batch-id sequence above the folded generation
 * ([[IvfIndex.nextBatchId]] + the fold's strictly-increasing gen rule).
 */
object VectorService {

  /** Drain + stop the service's streams, rebuild at `nlist`, return the
    * new model for the restarted streams. */
  def coordinatedRebuild(
      spark: SparkSession,
      path: String,
      nlist: Int,
      streams: Seq[StreamingQuery],
      iters: Int = 3): IvfIndex.Model = {
    streams.foreach(_.processAllAvailable())
    streams.foreach(_.stop())
    streams.foreach(_.awaitTermination())
    IvfIndex.rebuildIndex(spark, path, nlist, iters)
  }
}
