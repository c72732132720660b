package graft.streaming

import graft.operators.DatasetExport
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Incremental dataset export — [[graft.operators.DatasetExport]]'s
 * integrity-manifest surface over the CDC loop: each micro-batch of
 * curated documents appends batch-addressed shard files and manifest
 * DELTA rows ([[DatasetExport.appendBatch]]'s overwrite-by-batch-id
 * idempotence, the CellStoreIngest commit discipline), so a crashed or
 * replayed batch can never double-count in the manifest, and
 * [[DatasetExport.verifyIncremental]] audits the merged manifest against
 * the shard files at any point in the stream's life.
 */
object StreamExport {

  def start(
      docs: DataFrame,
      outDir: String,
      numShards: Int,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val writeBatch: (DataFrame, Long) => Unit = (batch, batchId) =>
      DatasetExport.appendBatch(batch, outDir, numShards, batchId)
    docs.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
