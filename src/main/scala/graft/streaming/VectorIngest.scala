package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming vector ingest with online index maintenance — the write half
 * of a continuously-updated ANN service: each micro-batch of new vectors
 * is routed into the persisted IVF index's EXISTING cell partitions
 * ([[IvfIndex.appendToIndex]] — assign against the frozen centroids, no
 * retrain, no rewrite), so searches running against the index see the new
 * vectors through the same dynamic partition pruning as the original
 * build.
 *
 * Maintenance stays the batch operator's job: the footer-only
 * [[IvfIndex.cellStats]]/`driftReport` watches cell balance as the stream
 * appends, and a triggered `rebuildIndex` swaps in a retrained layout —
 * the ingest itself never blocks on a retrain. (The coupling of a cheap
 * always-on append path with an offline rebuild trigger is how large ANN
 * deployments stay fresh without write amplification.)
 *
 * Batch-level exactly-once follows the [[CellStoreIngest]] argument:
 * foreachBatch may replay a batch after a crash BEFORE its checkpoint
 * commit; parquet appends are not self-deduplicating, so a replayed batch
 * can double-append. The driftReport catches the imbalance; deployments
 * needing strict exactly-once route through the cell store's rename-in
 * commit instead (CellStoreIngest) and compact into the index layout.
 */
object VectorIngest {

  /** Start appending the embedding stream into the index at `path`. */
  def start(
      embeddings: DataFrame,
      model: IvfIndex.Model,
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val appendBatch: (DataFrame, Long) => Unit = (batch, _) =>
      IvfIndex.appendToIndex(batch, model, path)
    embeddings.writeStream
      .foreachBatch(appendBatch)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
