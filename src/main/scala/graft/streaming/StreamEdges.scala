package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
 * group sort by (ts, event_id), so replays are order-stable). A null
 * item (missing/malformed `props."$.k"`) is kept as a CHAIN BREAKER,
 * exactly as the batch lag() treats it — dropping such events instead
 * would invent an edge across the gap, and failing on them would wedge
 * the stream on one bad record forever.
 *
 * TWO disorder disciplines, matching the two real delivery shapes
 * (the [[StreamFunnel]] pairing):
 *
 *  - [[transitionsStream]] (eager) — PARITY PRECONDITION: per-user
 *    IN-ORDER delivery across micro-batches (the CDC-replication shape
 *    the specs pin). The state keeps only the LAST visit, so an event
 *    arriving in a later batch with an earlier timestamp cannot be
 *    spliced into already-emitted transitions; batch equality holds
 *    when each user's events are batch-monotone (in-batch disorder is
 *    sorted away here). The fold DETECTS cross-batch regressions
 *    against the state's high-water (timestamp, event_id) pair and
 *    drops them deterministically — the watermark-style late-data
 *    discipline — rather than emitting a time-reversed edge; carrying
 *    the PAIR also makes a redelivered boundary event (ts equal to the
 *    high-water) a no-op instead of a double-counted transition, so
 *    at-least-once delivery cannot inflate edge weights.
 *
 *  - [[transitionsStreamBuffered]] (watermark-buffered) — true
 *    out-of-order parity for late-heavy sources: events are HELD in
 *    per-user state until the event-time watermark passes them, then
 *    folded and emitted in global (ts, event_id) order, so a late
 *    event INSERTS its edges and the merged edge table equals the
 *    batch pipeline on ANY batch assignment of the same events within
 *    the lateness bound (permuted-delivery spec).
 *
 * Slices land per batch as `root/delta=b<batchId>` partial edge counts
 * (the [[DeltaLayout]] discipline: a replay overwrites its own slice,
 * and the engine restores the state checkpoint of batch N−1 before
 * re-emitting batch N, so re-emission is idempotent). Edge counts are
 * per-slice PARTIALS that merge by sum; [[mergedEdges]] re-aggregates
 * over the LIVE slice set with an explicit schema (an early batch with
 * zero transitions leaves a data-file-less slice — schema inference
 * would throw on it); [[freshRank]] runs the exact integer power
 * iteration over the merged edges — spec-pinned EQUAL to the batch
 * pipeline over the same events, boundaries included. [[compact]]
 * folds the live slices and COMMITS with [[DeltaLayout.commitFold]]'s
 * single rename, so there is no window where a reader double-counts
 * folded slices, and a crash at any point leaves a correct live set.
 *
 * 100 TB shape: each batch touches its own events plus one state row
 * per active user; the merged edge table is transition-domain-sized
 * with map-side-combined sums; ranking never reads events at all.
 */
object StreamEdges {

  final case class Visit(userId: Long, tsMicros: Long, eventId: Long, k: Option[Long])
  /** `(tsMicros, eventId)` is the per-user high-water PAIR — the
    * cross-batch regression detector (see object doc). Tracking the pair,
    * not the timestamp alone, closes the boundary-tie hole: an event
    * REDELIVERED in a later batch carries ts == high-water and a `>=`
    * timestamp filter would re-fold it, double-counting its transition
    * weight (the sum-fold is not idempotent the way the funnel's max-fold
    * is). The lexicographic pair mirrors the (ts, event_id) sort key, so
    * exactly the already-folded prefix is rejected.
    *
    * `(stateVersion, reserved)` is the [[StateVersion]] evolution
    * discipline: future semantic changes bump the version, future data
    * lands in the bag — neither changes the encoder schema, so the NEXT
    * evolution resumes this checkpoint. (Checkpoints written before
    * round 14's shape cannot resume — the one final break, SURVEY §12.) */
  final case class LastVisit(k: Option[Long], tsMicros: Long, eventId: Long,
      stateVersion: Int = StateVersion.Current,
      reserved: Map[String, String] = Map.empty)
  final case class Transition(src: Long, dst: Long)

  /** A not-yet-folded event held until the watermark passes it. */
  final case class PendingVisit(tsMicros: Long, eventId: Long, k: Option[Long])
  /** [[Visit]] plus the raw watermarked `ts` column — the event-time
    * attribute must survive into the stateful operator's input for the
    * event-time timeout to bind (the [[StreamFunnel.VisitT]] contract). */
  final case class VisitT(userId: Long, tsMicros: Long, eventId: Long,
      k: Option[Long], ts: java.sql.Timestamp)
  /** Buffered-fold state: the last FOLDED visit's item (`hasPrev`/`prevK`
    * — flattened because nested Options do not encode), the folded
    * high-water pair, and the held events — plus the [[StateVersion]]
    * evolution fields, so this state class never needs a schema break. */
  final case class BufferedEdgeState(hasPrev: Boolean, prevK: Option[Long],
      maxTs: Long, maxEventId: Long, pending: Seq[PendingVisit],
      stateVersion: Int = StateVersion.Current,
      reserved: Map[String, String] = Map.empty)

  private val pairOrd = Ordering[(Long, Long)]

  private val EdgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("w", LongType)))

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
          // rollback guard: future-stamped state fails loudly (StateVersion)
          val restored = StateVersion.checkRestored(state.getOption)(_.stateVersion)
          var prev = restored
          val floor = prev.map(p => (p.tsMicros, p.eventId))
            .getOrElse((Long.MinValue, Long.MinValue))
          val ordered = rows.toSeq.sortBy(v => (v.tsMicros, v.eventId))
            // cross-batch regression OR boundary-tie redelivery: drop —
            // strictly-after the folded (ts, eventId) pair only
            .filter(v => Ordering[(Long, Long)].gt((v.tsMicros, v.eventId), floor))
          // re-stamped Current with the CARRIED reserved bag: a newer
          // version's extension data must survive a fold by this writer
          val carried = restored.map(_.reserved).getOrElse(Map.empty)
          val out = Seq.newBuilder[Transition]
          ordered.foreach { v =>
            for (p <- prev; pk <- p.k; vk <- v.k; if pk != vk)
              out += Transition(pk, vk)
            // null k breaks the chain, as lag() does
            prev = Some(LastVisit(v.k, v.tsMicros, v.eventId,
              StateVersion.Current, carried))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /**
   * Watermark-buffered variant — exact stream ≡ batch parity on
   * OUT-OF-ORDER delivery (the [[StreamFunnel.depthStreamBuffered]]
   * discipline applied to the edge fold): `events` must already carry an
   * event-time watermark on `ts` (see [[startBuffered]]); each user's
   * events are HELD in state until the watermark passes them, then folded
   * — and their transitions EMITTED — in (ts, event_id) order. A late
   * event inside the lateness bound therefore INSERTS its edges into the
   * chain (the eager [[transitionsStream]] documents the same arrival as
   * a drop), because nothing at or after its position has been folded
   * yet: the watermark guarantees every already-emitted transition ends
   * strictly before it. Events at-or-below the folded high-water pair
   * (beyond-watermark stragglers and redeliveries) drop, and duplicates
   * within the buffer collapse — at-least-once delivery cannot inflate
   * edge weights.
   *
   * Cost: state per user is the last folded item plus the in-flight
   * (post-watermark) events — bounded by watermark delay × per-user
   * rate, never by history. Event-time timeouts flush users whose
   * pending events age past the watermark without new arrivals.
   */
  def transitionsStreamBuffered(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
        col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsMicros"),
        col("event_id").as("eventId"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"),
        col("ts"))
      .as[VisitT]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[BufferedEdgeState, Transition](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (_, rows, state: GroupState[BufferedEdgeState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          // rollback guard: future-stamped state fails loudly (StateVersion)
          val init = StateVersion.checkRestored(state.getOption)(_.stateVersion)
            .getOrElse(BufferedEdgeState(
            hasPrev = false, prevK = None,
            maxTs = Long.MinValue, maxEventId = Long.MinValue,
            pending = Seq.empty))
          val floor = (init.maxTs, init.maxEventId)
          val incoming = rows
            .map(v => PendingVisit(v.tsMicros, v.eventId, v.k))
            .filter(p => pairOrd.gt((p.tsMicros, p.eventId), floor))
          val all = (init.pending ++ incoming).distinct
          // STRICTLY below the watermark only — an event AT the watermark
          // could still gain a same-ts, lower-event_id sibling in a later
          // batch (the StreamFunnel.depthStreamBuffered boundary rule)
          val (readyU, hold) = all.partition(_.tsMicros < wmMicros)
          val ready = readyU.sortBy(p => (p.tsMicros, p.eventId))
          val out = Seq.newBuilder[Transition]
          var hasPrev = init.hasPrev
          var prevK = init.prevK
          ready.foreach { v =>
            for (pk <- (if (hasPrev) prevK else None); vk <- v.k; if pk != vk)
              out += Transition(pk, vk)
            hasPrev = true
            prevK = v.k // null k breaks the chain, as the batch lag() does
          }
          val (maxTs, maxEv) = ready.lastOption
            .map(p => (p.tsMicros, p.eventId)).getOrElse(floor)
          state.update(BufferedEdgeState(hasPrev, prevK, maxTs, maxEv, hold,
            StateVersion.Current, init.reserved))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(hold.map(_.tsMicros).min / 1000L,
                state.getCurrentWatermarkMs() + 1L))
          out.result().iterator
      }
  }

  /** Wire an event stream into per-batch edge-count slices under `root`. */
  def start(events: DataFrame, root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    wire(transitionsStream(events), root, checkpoint, trigger)

  /** [[transitionsStreamBuffered]] wired the same way; `lateness` is the
    * watermark delay bound on out-of-orderness (e.g. "1 hour"). */
  def startBuffered(events: DataFrame, root: String, checkpoint: String,
      lateness: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    wire(transitionsStreamBuffered(events.withWatermark("ts", lateness)),
      root, checkpoint, trigger)

  private def wire(transitions: Dataset[Transition], root: String,
      checkpoint: String, trigger: Trigger): StreamingQuery =
    transitions.toDF()
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
  def mergedEdges(spark: SparkSession, root: String): DataFrame = {
    val dirs = DeltaLayout.liveDirs(spark, root)
    require(dirs.nonEmpty, s"no edge slices under $root")
    spark.read.schema(EdgeSchema).parquet(dirs: _*)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
  }

  /** Integer PageRank over the live graph — never touches event history. */
  def freshRank(spark: SparkSession, root: String, iters: Int = 5): DataFrame =
    LinkRank.pageRank(mergedEdges(spark, root), iters)

  /** Fold the live slices into the next base generation (sums of sums)
    * and commit with [[DeltaLayout.commitFold]]'s single atomic rename.
    * Concurrent-writer-GUARDED since round 17 ([[DeltaLayout
    * .guardedCommit]]): a slice landing after the fold read its input
    * aborts the commit loudly pre-rename and is refused GC post-rename —
    * the single-writer contract is enforced, not documented. */
  def compact(spark: SparkSession, root: String): Unit =
    compactFrom(spark, root, DeltaLayout.liveDirs(spark, root))

  /** [[compact]] from an explicit live-set snapshot — the seam the race
    * specs inject through. */
  private[graft] def compactFrom(spark: SparkSession, root: String,
      dirs: Seq[String]): Unit =
    DeltaLayout.foldTarget(dirs) match {
      case Some(maxId) =>
        val folded = spark.read.schema(EdgeSchema).parquet(dirs: _*)
          .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
          .localCheckpoint()
        folded.write.mode("overwrite").parquet(s"$root/${DeltaLayout.Staging}")
        DeltaLayout.guardedCommit(spark, root, dirs, maxId, "edge compact",
          "re-run the raced batches (replay-idempotent), then compact again")
      case None => DeltaLayout.gcStale(spark, root)
    }
}
