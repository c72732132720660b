package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/**
 * Streaming funnel — [[graft.operators.EventAnalytics.funnel]]'s
 * reachability DP carried as per-user state, so conversion chains that
 * STRADDLE micro-batch boundaries complete exactly as the batch DP
 * would (a view in batch 3 converting on a click in batch 7 is the
 * normal case at streaming granularity, not an edge case).
 *
 * The DP state is tiny and exact: per user, the latest REACHABLE
 * completion time of each step prefix — precisely the cumulative-max
 * column the batch windows compute, k longs per user, independent of
 * history length. Each batch folds its events in (ts, event_id) order
 * into that state and emits the user's current funnel depth; slices
 * land per batch (`root/delta=b<id>`, replay-idempotent overwrite) and
 * [[counts]] reads the per-user MAX depth across slices (depth is
 * monotone, so merging is associative) into the step table.
 *
 * PARITY PRECONDITION — per-user IN-ORDER delivery across
 * micro-batches (the CDC-replication shape the specs pin). The state
 * keeps only max reachable times, so an event arriving in a LATER
 * batch with an EARLIER timestamp cannot be replayed into the ordered
 * DP; batch equality holds when each user's events are batch-monotone
 * (events within one batch are sorted here, so only cross-batch
 * regressions matter). Rather than silently folding such an event into
 * the wrong state, the fold DETECTS it against the per-user high-water
 * timestamp and drops it deterministically — the late-data discipline
 * watermarked aggregations apply — so a disordered source degrades to
 * documented late-event drops, never to silently corrupt depths.
 *
 * 100 TB shape: per batch, work is batch-sized plus one state row per
 * active user; the depth slices are user-domain-sized; nothing ever
 * replays event history.
 */
object StreamFunnel {

  final case class Visit(userId: Long, tsMicros: Long, eventId: Long, eventType: String)
  /** `maxTs` is the per-user high-water timestamp of every event already
    * folded — the cross-batch regression detector (see object doc). */
  final case class FunnelState(reach: Seq[Long], depth: Int, maxTs: Long)
  final case class UserDepth(userId: Long, depth: Int)

  /** Event stream → per-user current funnel depth after each batch. */
  def depthStream(events: DataFrame, steps: Seq[String],
      windowMicros: Long): Dataset[UserDepth] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.length
    events.select(
        col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsMicros"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"))
      .as[Visit]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, UserDepth](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[FunnelState]) =>
          val init = state.getOption
            .getOrElse(FunnelState(Seq.fill(k)(-1L), 0, Long.MinValue))
          val reach = init.reach.toArray
          var depth = init.depth
          var maxTs = init.maxTs
          rows.toSeq.sortBy(v => (v.tsMicros, v.eventId))
            .filter(v => v.tsMicros >= init.maxTs) // cross-batch regression: drop, never corrupt
            .foreach { v =>
            maxTs = math.max(maxTs, v.tsMicros)
            // every step index this event's type occupies, decided
            // against the PRE-event state (the batch DP's strict
            // 1-PRECEDING frame: one event must not complete two
            // consecutive steps of a repeated-type funnel)
            val updates = steps.indices
              .filter(j => steps(j) == v.eventType)
              .flatMap { j =>
                if (j == 0) Some(0)
                else if (reach(j - 1) >= 0 && v.tsMicros >= reach(j - 1) &&
                  v.tsMicros - reach(j - 1) <= windowMicros) Some(j)
                else None
              }
            updates.foreach { j =>
              reach(j) = math.max(reach(j), v.tsMicros)
              depth = math.max(depth, j + 1)
            }
          }
          state.update(FunnelState(reach.toSeq, depth, maxTs))
          Iterator.single(UserDepth(user, depth))
      }
  }

  /** Wire the stream into per-batch depth slices under `root`. */
  def start(events: DataFrame, steps: Seq[String], windowMicros: Long,
      root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    depthStream(events, steps, windowMicros).toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$root/delta=b$id")
      }
      .start()

  private val DepthSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("userId",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("depth",
      org.apache.spark.sql.types.IntegerType)))

  /** The live step table: per-user max depth across slices → counts.
    * Slices list via [[DeltaLayout.liveDirs]] and read with an explicit
    * schema (the [[StreamEdges.mergedEdges]] hardening): a run whose
    * batches all emitted zero rows leaves data-file-less slices where
    * schema inference throws — here that is simply zero users. */
  def counts(spark: SparkSession, root: String, steps: Seq[String]): DataFrame = {
    val dirs = DeltaLayout.liveDirs(spark, root)
    val depthRows =
      if (dirs.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], DepthSchema)
      else spark.read.schema(DepthSchema).parquet(dirs: _*)
    val depth = depthRows
      .groupBy("userId").agg(max(col("depth")).as("depth"))
    val aggs = steps.indices.map(i =>
      count(when(col("depth") >= i + 1, 1)).as(s"n${i + 1}"))
    val row = depth.agg(aggs.head, aggs.tail: _*).head
    import spark.implicits._
    steps.indices.map(i => ((i + 1).toLong, steps(i), row.getLong(i)))
      .toDF("step", "event_type", "n_users")
  }
}
