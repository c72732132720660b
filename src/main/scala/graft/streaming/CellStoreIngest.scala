package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Continuous ingest into the cell store — the CDC/append path the batch
 * writer lacked. Each micro-batch is routed through the DSv2 cellstore
 * writer in append mode, so EVERY batch gets the planner-enforced layout:
 * salted stores re-cluster the delta into the store's N buckets (manifest
 * pins N; a drifting option is rejected), range stores range-partition it.
 * Region/bucket pruning therefore survives ingest — a point GET on a
 * salted store still plans exactly ONE InputPartition no matter how many
 * batches have landed, because the scan groups bucket files across jobs.
 *
 * Upstream state (watermarked dedup via [[StreamDedup]], sessionization)
 * composes ahead of the sink as plain stream transforms. Append files are
 * job-unique, so a retried batch cannot clobber committed data; exactly-once
 * at the batch level is the checkpoint's replay contract (foreachBatch may
 * re-run a batch after a crash — the compaction pass, `Compaction`, is the
 * idempotent repair for that, exactly like HBase minor compaction).
 */
object CellStoreIngest {

  /**
   * Start streaming `cells` (cell-schema frame) into the store at `path`.
   *
   * @param buckets    salt bucket count for a new store; an existing salted
   *                   store's manifest wins (mismatch throws)
   * @param checkpoint streaming checkpoint dir (offset/commit log)
   */
  def start(
      cells: DataFrame,
      path: String,
      buckets: Int,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val writeBatch: (DataFrame, Long) => Unit = (batch, _) =>
      batch.write.format("cellstore")
        .option("buckets", buckets.toString)
        .mode("append").save(path)
    cells.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
