package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming ANN query serving — the READ half of the continuously-updated
 * vector service whose write half is [[VectorIngest]]: each micro-batch
 * of query vectors is answered from the persisted IVF index via
 * [[IvfIndex.searchIndex]] (the same partition-pruned probe the batch
 * tier serves), and the per-batch result lands as a batch-id-addressed
 * slice of the output root.
 *
 * Freshness by construction: every batch re-plans the probe over the
 * index's LIVE slice set, so vectors a concurrent [[VectorIngest]]
 * appended BETWEEN query batches are visible to the next batch with no
 * coordination — the two streams meet only at the [[DeltaLayout]]
 * liveness rules (an uncommitted slice is invisible, a committed one is
 * complete). The serving MODEL (centroids) is frozen at start like the
 * ingest side's; a rebuild that retrains centroids requires restarting
 * both streams with the new model ([[IvfIndex.rebuildIndex]]'s
 * documented contract).
 *
 * Output exactly-once at the batch level: a foreachBatch replay finds
 * its result slice already committed and writes nothing
 * ([[DeltaLayout.writeSlice]] — the [[VectorIngest]] discipline applied
 * to the answer stream), so downstream consumers of [[results]] can sum
 * and join without dedup.
 *
 * Scale shape: per batch, one broadcast of (query × nprobe) probe rows
 * against the cell-pruned index scan — queries per micro-batch bound the
 * broadcast, nprobe/nlist bounds the scanned fraction; nothing grows
 * with the number of batches served except the output slices, which
 * [[DeltaLayout]] compaction folds like any other delta root.
 */
object StreamAnnServe {

  /** Start answering the query-vector stream (`vec_id`, `embedding`)
    * from the index at `indexPath`; top-`k` per query at `nprobe`. */
  def start(
      queries: DataFrame,
      model: IvfIndex.Model,
      indexPath: String,
      out: String,
      checkpoint: String,
      k: Int,
      nprobe: Int,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = queries.sparkSession
    queries.writeStream
      .foreachBatch(serveBatch(spark, model, indexPath, out, k, nprobe))
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** One micro-batch: probe the live index, commit the answer slice.
    * Exposed so a replay (same batchId) is directly testable. */
  private[graft] def serveBatch(spark: SparkSession, model: IvfIndex.Model,
      indexPath: String, out: String, k: Int,
      nprobe: Int): (DataFrame, Long) => Unit = (batch, batchId) => {
    val res = IvfIndex.searchIndex(spark, indexPath, batch, model, k, nprobe)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
    DeltaLayout.writeSlice(res, out, s"delta=b$batchId")
    ()
  }

  /** Every answer served so far (live output slices, unioned). */
  def results(spark: SparkSession, out: String): DataFrame = {
    val dirs = DeltaLayout.liveDirs(spark, out)
    require(dirs.nonEmpty, s"no served results under $out")
    spark.read.parquet(dirs: _*)
  }

  /** Fold the answer slices into one base generation
    * ([[DeltaLayout.compactConcat]] — answers are per-batch facts, the
    * fold is a union): run occasionally so the output root's slice
    * count — and with it every [[results]] listing — stays bounded no
    * matter how many batches were served. Guarded like every fold in
    * the engine: an answer slice committed by a concurrent serve batch
    * aborts the fold loudly instead of being swept un-read. */
  def compact(spark: SparkSession, out: String): Unit =
    DeltaLayout.compactConcat(spark, out)
}
