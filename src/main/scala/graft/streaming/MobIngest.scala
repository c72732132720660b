package graft.streaming

import graft.operators.MobStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming ingest into a MOB store ([[graft.operators.MobStore]] layout):
 * each micro-batch splits at the threshold, appends NEW blobs to the
 * content-addressed side table, and appends ref + plain cells to the main
 * store through the DSv2 salted writer (same layout discipline as
 * [[CellStoreIngest]] — GETs keep pruning to one bucket however many
 * batches land).
 *
 * Cross-batch dedup is the content address: a batch's blobs anti-join the
 * side table's (mob_key, mob_len) before appending, so a blob seen in any
 * earlier batch — or an earlier ATTEMPT of this batch — stores zero new
 * bytes. The key-only probe is a column-pruned parquet read of two BIGINT
 * columns; blob pages are never touched.
 *
 * Write order is MOB FIRST, then main: a crash between the two writes
 * leaves orphan blobs (unreachable, reclaimable, harmless) rather than
 * dangling refs (visible rows that fail to resolve). Batch replay after a
 * crash follows the [[CellStoreIngest]] contract: blob re-appends are
 * no-ops (the anti-join), main-cell re-appends are identical coordinates a
 * compaction folds away.
 */
object MobIngest {

  def start(
      cells: DataFrame,
      dir: String,
      threshold: Int,
      buckets: Int,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    require(threshold > 0, "mob threshold must be positive")
    val writeBatch: (DataFrame, Long) => Unit = (batch, _) => {
      val spark = batch.sparkSession
      val mobPath = s"$dir/mob"
      val blobs = batch.filter(MobStore.isBlob(threshold))
      val entries = MobStore.blobEntries(blobs)
      val hPath = new org.apache.hadoop.fs.Path(mobPath)
      val exists = hPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(hPath)
      // Probe with an EXPLICIT schema: a crashed writer can leave the
      // dir existing with no committed data files (only _temporary),
      // where schema inference fails on every replay and permanently
      // wedges the stream — a fixed schema reads that state as an
      // empty side table instead.
      val probeSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("mob_key",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("mob_len",
          org.apache.spark.sql.types.LongType)))
      val fresh =
        if (exists)
          entries.join(
            spark.read.schema(probeSchema).parquet(mobPath)
              .select("mob_key", "mob_len"),
            Seq("mob_key", "mob_len"), "left_anti")
        else entries
      fresh.write.mode("append").parquet(mobPath)
      batch.filter(!MobStore.isBlob(threshold))
        .unionByName(MobStore.refCells(blobs))
        .write.format("cellstore")
        .option("buckets", buckets.toString)
        .mode("append").save(s"$dir/main")
    }
    cells.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
