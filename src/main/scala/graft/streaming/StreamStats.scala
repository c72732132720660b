package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Incremental ANALYZE — table statistics that stay fresh under streaming
 * ingest without ever rescanning history. Each micro-batch appends one
 * DELTA row per tracked column: row/null counts plus the batch's HLL
 * sketch (Spark's built-in `hll_sketch_agg`, the datasketches format
 * [[graft.operators.Sketches]] already serves). Counts are additive and
 * sketches are MERGEABLE (`hll_union_agg`), so the merged view —
 * what [[graft.operators.StatsPlanner]] wants for a join decision — is
 * an aggregation over the small delta table, never over the data.
 *
 * At 100 TB this is the only shape that keeps ANALYZE true: the corpus
 * arrives continuously, a full re-scan per refresh is a corpus read,
 * and the delta table grows by |columns| rows per batch (compactable by
 * the same union if it ever matters).
 *
 * Crash/replay discipline: deltas land in batch-id-addressed
 * directories in overwrite mode — the [[graft.operators.DatasetExport]]
 * / CellStoreIngest contract — so an at-least-once foreachBatch replay
 * rewrites its own delta instead of double-counting it.
 */
object StreamStats {

  def appendBatch(
      batch: DataFrame, columns: Seq[String],
      statsDir: String, batchId: Long): Unit = {
    require(columns.nonEmpty)
    // one pruned pass per column (the TableStats.analyze discipline: a
    // multi-column sketch agg is fine — no countDistinct rewrite here —
    // but per-column rows keep the delta schema uniform and prunable)
    columns.map { c =>
      batch.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("_cnt"),
        hll_sketch_agg(col(c), lit(12)).as("sketch"))
        .select(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col("_cnt")).as("n_nulls"), col("sketch"))
    }.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
  }

  def start(
      data: DataFrame,
      columns: Seq[String],
      statsDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val writeBatch: (DataFrame, Long) => Unit = (batch, batchId) =>
      appendBatch(batch, columns, statsDir, batchId)
    data.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** The merged statistics view: one row per column over ALL ingested
    * batches — counts summed, ndv from the union of the delta sketches.
    * Cost ∝ batches × columns, independent of the data volume. */
  def merged(spark: SparkSession, statsDir: String): DataFrame =
    spark.read.parquet(statsDir)
      .groupBy("col_name")
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_nulls")).as("n_nulls"),
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("ndv_approx"))
}
