package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.operators.LinkRank

/**
 * Link-graph freshness under streaming ingest — the fourth leg of the
 * freshness family ([[StreamStats]] statistics, [[StreamRollup]]
 * aggregates, [[StreamIndex]] search): the event stream keeps the
 * transition graph current so [[LinkRank]] can re-rank from the live
 * edges without ever rescanning event history.
 *
 * The hard part is the BATCH BOUNDARY: a user's consecutive visits
 * split across micro-batches still form a transition, so per-batch
 * windowing would silently drop every cross-batch edge. State fixes it:
 * `flatMapGroupsWithState` keeps ONE row per user — the last visited
 * item — and each batch emits the boundary transition from that state
 * to the batch's first event before folding the rest (events within a
 * group sort by (ts, event_id), so replays are order-stable). State is
 * user-domain-sized, not history-sized.
 *
 * Slices land per batch as `root/delta=b<batchId>` partial edge counts
 * (the [[StreamRollup]] delta discipline: a replay overwrites its own
 * slice, and the engine restores the state checkpoint of batch N−1
 * before re-emitting batch N, so re-emission is idempotent). Edge
 * counts are per-slice PARTIALS that merge by sum; [[mergedEdges]]
 * re-aggregates, [[freshRank]] runs the exact integer power iteration
 * over the merged edges — spec-pinned EQUAL to the batch pipeline over
 * the same events, boundaries included. [[compact]] folds slices into
 * `delta=base` through Hadoop FileSystem with checked deletes
 * (single-writer contract, as [[StreamRollup.compact]]).
 *
 * 100 TB shape: each batch touches its own events plus one state row
 * per active user; the merged edge table is transition-domain-sized
 * with map-side-combined sums; ranking never reads events at all.
 */
object StreamEdges {

  final case class Visit(userId: Long, tsMicros: Long, eventId: Long, k: Long)
  final case class LastVisit(k: Long, tsMicros: Long, eventId: Long)
  final case class Transition(src: Long, dst: Long)

  /** Raw event stream → per-user transitions, cross-batch edges included. */
  def transitionsStream(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
        col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsMicros"),
        col("event_id").as("eventId"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .as[Visit]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[LastVisit, Transition](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[LastVisit]) =>
          val ordered = rows.toSeq.sortBy(v => (v.tsMicros, v.eventId))
          var prev = state.getOption
          val out = Seq.newBuilder[Transition]
          ordered.foreach { v =>
            prev.foreach(p => if (p.k != v.k) out += Transition(p.k, v.k))
            prev = Some(LastVisit(v.k, v.tsMicros, v.eventId))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Wire an event stream into per-batch edge-count slices under `root`. */
  def start(events: DataFrame, root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    transitionsStream(events).toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
          .write.mode("overwrite").parquet(s"$root/delta=b$id")
      }
      .start()

  /** The live edge table: per-slice partial counts re-summed. */
  def mergedEdges(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))

  /** Integer PageRank over the live graph — never touches event history. */
  def freshRank(spark: SparkSession, root: String, iters: Int = 5): DataFrame =
    LinkRank.pageRank(mergedEdges(spark, root), iters)

  /** Fold all slices into one `delta=base` (sums of sums), then remove
    * the folded batch slices — Hadoop FileSystem, checked results, the
    * single-writer discipline of [[StreamRollup.compact]]. */
  def compact(spark: SparkSession, root: String): Unit = {
    val folded = mergedEdges(spark, root).localCheckpoint()
    folded.write.mode("overwrite").parquet(s"$root/delta=base")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("delta=b") &&
        s.getPath.getName != "delta=base")
      .foreach { s =>
        if (!fs.delete(s.getPath, true))
          throw new IllegalStateException(
            s"edge compact: cannot remove folded slice ${s.getPath}")
      }
  }
}
