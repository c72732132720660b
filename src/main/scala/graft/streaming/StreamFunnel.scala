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
 * TWO disorder disciplines, matching the two real delivery shapes:
 *
 *  - [[depthStream]] (eager) — PARITY PRECONDITION: per-user IN-ORDER
 *    delivery across micro-batches (the CDC-replication shape). The
 *    state keeps only max reachable times, so an event arriving in a
 *    LATER batch below the per-user high-water (timestamp, event_id)
 *    pair cannot be replayed into the ordered DP; the fold DETECTS it
 *    and drops it deterministically — the late-data discipline
 *    watermarked aggregations apply — so a disordered source degrades
 *    to documented late-event drops, never to silently corrupt depths.
 *    Tracking the PAIR (not the timestamp alone) also rejects a
 *    redelivered boundary event with ts == high-water, which a `>=`
 *    timestamp filter would fold AGAIN against post-event state and
 *    let one event complete two steps across batches.
 *
 *  - [[depthStreamBuffered]] (watermark-buffered) — true out-of-order
 *    parity for late-heavy sources: events are HELD in per-user state
 *    until the event-time watermark passes them, then folded in global
 *    (ts, event_id) order, so stream ≡ batch on ANY batch assignment
 *    of the same events (shuffled delivery included) as long as
 *    lateness stays inside the watermark delay. Costs state
 *    proportional to each user's in-flight (post-watermark) events —
 *    bounded by the watermark delay × per-user rate, NOT by history.
 *    Event-time timeouts flush users whose pending events age past the
 *    watermark without new data arriving.
 *
 * NOTE — checkpoint compatibility: round 13 added `maxEventId` (a
 * schema break), and round 14 added the [[StateVersion]] evolution
 * fields — the LAST such break: checkpoints written by pre-round-14
 * builds cannot resume (start a fresh checkpoint dir; the emitted
 * delta slices remain valid), but from round 14 on, semantic changes
 * ride the version field and new data rides the reserved bag, so
 * future upgrades resume in place.
 *
 * 100 TB shape: per batch, work is batch-sized plus one state row per
 * active user; the depth slices are user-domain-sized; nothing ever
 * replays event history.
 */
object StreamFunnel {

  final case class Visit(userId: Long, tsMicros: Long, eventId: Long, eventType: String)
  /** `(maxTs, maxEventId)` is the high-water pair of every event already
    * folded — the cross-batch regression + boundary-replay detector
    * (see object doc). `(stateVersion, reserved)` is the [[StateVersion]]
    * evolution discipline: future semantic changes bump the version,
    * future per-user data lands in the bag — neither changes the encoder
    * schema, so the NEXT evolution resumes this checkpoint. */
  final case class FunnelState(reach: Seq[Long], depth: Int, maxTs: Long,
      maxEventId: Long,
      stateVersion: Int = StateVersion.Current,
      reserved: Map[String, String] = Map.empty)
  final case class UserDepth(userId: Long, depth: Int)

  /** A not-yet-folded event held until the watermark passes it. */
  final case class Pending(tsMicros: Long, eventId: Long, eventType: String)
  /** [[Visit]] plus the raw watermarked `ts` column — the event-time
    * attribute must SURVIVE into the stateful operator's input for Spark
    * to accept an event-time timeout (a projection to `tsMicros` alone
    * strips the watermark tag). */
  final case class VisitT(userId: Long, tsMicros: Long, eventId: Long,
      eventType: String, ts: java.sql.Timestamp)
  final case class BufferedState(reach: Seq[Long], depth: Int,
      maxTs: Long, maxEventId: Long, pending: Seq[Pending],
      stateVersion: Int = StateVersion.Current,
      reserved: Map[String, String] = Map.empty)

  /** Fold `ordered` (already sorted by (ts, eventId)) into the DP arrays.
    * Every step index an event's type occupies is decided against the
    * PRE-event state — the batch DP's strict 1-PRECEDING frame: one event
    * must not complete two consecutive steps of a repeated-type funnel. */
  private def foldOrdered(steps: Seq[String], windowMicros: Long,
      reach: Array[Long], depth0: Int, ordered: Seq[Pending]): Int = {
    var depth = depth0
    ordered.foreach { v =>
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
    depth
  }

  private val pairOrd = Ordering[(Long, Long)]

  /** Event stream → per-user current funnel depth after each batch
    * (eager fold; see object doc for the in-order precondition). */
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
          // rollback guard: future-stamped state fails loudly (StateVersion)
          val init = StateVersion.checkRestored(state.getOption)(_.stateVersion)
            .getOrElse(FunnelState(Seq.fill(k)(-1L), 0, Long.MinValue, Long.MinValue))
          val reach = init.reach.toArray
          val floor = (init.maxTs, init.maxEventId)
          // cross-batch regression or boundary redelivery: drop, never corrupt
          val ordered = rows.toSeq
            .sortBy(v => (v.tsMicros, v.eventId))
            .filter(v => pairOrd.gt((v.tsMicros, v.eventId), floor))
            .map(v => Pending(v.tsMicros, v.eventId, v.eventType))
          val depth = foldOrdered(steps, windowMicros, reach, init.depth, ordered)
          val (maxTs, maxEv) = ordered.lastOption
            .map(p => (p.tsMicros, p.eventId)).getOrElse(floor)
          // re-stamp Current, CARRY the reserved bag: a newer version's
          // extension data must survive a fold by this writer
          state.update(FunnelState(reach.toSeq, depth, maxTs, maxEv,
            StateVersion.Current, init.reserved))
          Iterator.single(UserDepth(user, depth))
      }
  }

  /**
   * Watermark-buffered variant: exact stream ≡ batch parity on
   * OUT-OF-ORDER delivery. `events` must already carry an event-time
   * watermark on `ts` (see [[startBuffered]]); each user's events are
   * buffered in state until the watermark passes them, then folded in
   * (ts, event_id) order. Events at-or-below the already-folded
   * high-water pair (beyond-watermark stragglers and redeliveries) are
   * dropped — the same discipline watermarked aggregations apply.
   */
  def depthStreamBuffered(events: DataFrame, steps: Seq[String],
      windowMicros: Long): Dataset[UserDepth] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.length
    events.select(
        col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsMicros"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"),
        col("ts"))
      .as[VisitT]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[BufferedState, UserDepth](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[BufferedState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          // rollback guard: future-stamped state fails loudly (StateVersion)
          val init = StateVersion.checkRestored(state.getOption)(_.stateVersion)
            .getOrElse(
            BufferedState(Seq.fill(k)(-1L), 0, Long.MinValue, Long.MinValue, Seq.empty))
          val floor = (init.maxTs, init.maxEventId)
          // ingest: below the folded pair = beyond-watermark straggler or
          // redelivery — drop; duplicates within the buffer collapse too
          val incoming = rows
            .map(v => Pending(v.tsMicros, v.eventId, v.eventType))
            .filter(p => pairOrd.gt((p.tsMicros, p.eventId), floor))
          val all = (init.pending ++ incoming).distinct
          // STRICTLY below the watermark: an event AT the watermark could
          // still gain a same-timestamp, lower-event_id sibling in a later
          // batch (Spark only drops rows strictly below the watermark), and
          // folding it now would wrongly reject that sibling at the
          // high-water pair filter. Held events re-drive via the event-time
          // timeout once the watermark passes them.
          val (readyU, hold) = all.partition(_.tsMicros < wmMicros)
          val ready = readyU.sortBy(p => (p.tsMicros, p.eventId))
          val reach = init.reach.toArray
          val depth = foldOrdered(steps, windowMicros, reach, init.depth, ready)
          val (maxTs, maxEv) = ready.lastOption
            .map(p => (p.tsMicros, p.eventId)).getOrElse(floor)
          state.update(BufferedState(reach.toSeq, depth, maxTs, maxEv, hold,
            StateVersion.Current, init.reserved))
          // a user with pending events but no further arrivals must still be
          // re-invoked once the watermark passes them: event-time timeout at
          // the earliest pending ts (clamped strictly past the watermark)
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(hold.map(_.tsMicros).min / 1000L, state.getCurrentWatermarkMs() + 1L))
          Iterator.single(UserDepth(user, depth))
      }
  }

  /** Wire the stream into per-batch depth slices under `root`. */
  def start(events: DataFrame, steps: Seq[String], windowMicros: Long,
      root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    wire(depthStream(events, steps, windowMicros), root, checkpoint, trigger)

  /** [[depthStreamBuffered]] wired the same way; `lateness` is the
    * watermark delay bound on out-of-orderness (e.g. "1 hour"). */
  def startBuffered(events: DataFrame, steps: Seq[String], windowMicros: Long,
      lateness: String, root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    wire(
      depthStreamBuffered(events.withWatermark("ts", lateness), steps, windowMicros),
      root, checkpoint, trigger)

  private def wire(depths: Dataset[UserDepth], root: String,
      checkpoint: String, trigger: Trigger): StreamingQuery =
    depths.toDF()
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

  /** Fold the per-batch depth slices into one base generation holding
    * each user's MAX depth — exactly the merge [[counts]] applies on
    * read (max is idempotent and commutative, so fold∘merge ≡ merge),
    * committed under the [[DeltaLayout.guardedCommit]] concurrent-
    * writer guards. Bounds the slice count — and every [[counts]]
    * listing — under a long-running funnel stream. */
  def compact(spark: SparkSession, root: String): Unit =
    compactFrom(spark, root, DeltaLayout.liveDirs(spark, root))

  /** [[compact]] from an explicit snapshot — the race-spec seam. */
  private[graft] def compactFrom(spark: SparkSession, root: String,
      dirs: Seq[String]): Unit =
    DeltaLayout.foldTarget(dirs) match {
      case Some(maxId) =>
        val folded = spark.read.schema(DepthSchema).parquet(dirs: _*)
          .groupBy(col("userId")).agg(max(col("depth")).as("depth"))
          .localCheckpoint()
        folded.write.mode("overwrite")
          .parquet(s"$root/${DeltaLayout.Staging}")
        DeltaLayout.guardedCommit(spark, root, dirs, maxId,
          "funnel compact",
          "re-run the raced batches (replay-idempotent), then compact again")
      case None => DeltaLayout.gcStale(spark, root)
    }

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
