package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming sessionization (`flatMapGroupsWithState`): group events
 * by user, close a session after `gapMinutes` of inactivity, emit one
 * summary row per closed session. The custom-state path the built-in
 * windowed aggregates can't express (session windows keyed on activity
 * gaps with per-key evolving state).
 *
 * State per user is O(1) (an open-session accumulator), so executor memory
 * is bounded by live keys — the property that lets this run against an
 * unbounded stream at cluster scale. Event-time watermarking bounds how
 * late state can linger.
 */
object Sessionize {

  final case class Event(user_id: Long, ts_ms: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, errors: Long, sum: Double)
  final case class Session(
      user_id: Long,
      session_start_ms: Long,
      session_end_ms: Long,
      n_events: Long,
      n_errors: Long,
      sum_value: Double)

  def gapMs(gapMinutes: Int): Long = gapMinutes * 60L * 1000L

  /** Pure per-group transition shared by the streaming and batch paths:
    * fold time-ordered events into closed sessions + trailing open state. */
  def foldSessions(
      userId: Long,
      sorted: Seq[Event],
      gap: Long,
      open: Option[SessionState]): (Seq[Session], Option[SessionState]) = {
    var state = open
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      state match {
        case Some(s) if e.ts_ms - s.last <= gap =>
          state = Some(s.copy(
            last = e.ts_ms, n = s.n + 1,
            errors = s.errors + (if (e.event_type == "error") 1 else 0),
            sum = s.sum + e.value))
        case other =>
          other.foreach(s => closed +=
            Session(userId, s.start, s.last, s.n, s.errors, s.sum))
          state = Some(SessionState(e.ts_ms, e.ts_ms, 1,
            if (e.event_type == "error") 1 else 0, e.value))
      }
    }
    (closed.result(), state)
  }

  /** Streaming form: per-user state survives across micro-batches; with the
    * default `ProcessingTimeTimeout` an open session is flushed once the
    * user goes quiet for the gap. Pass `NoTimeout` for finite replays (a
    * pending processing-time timeout keeps even a Trigger.AvailableNow query
    * alive until it fires, so drain-and-stop runs must not arm it). */
  def sessions(
      events: Dataset[Event],
      gapMinutes: Int,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout()): Dataset[Session] = {
    val gap = gapMs(gapMinutes)
    val armTimeouts = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, s.start, s.last, s.n, s.errors, s.sum))
            state.remove()
            out.iterator
          } else {
            // buffers only this user's slice of ONE micro-batch (bounded by
            // trigger size), not their whole history — cross-batch state
            // stays the O(1) SessionState accumulator
            val (closed, open) =
              foldSessions(userId, it.toSeq.sortBy(_.ts_ms), gap, state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                if (armTimeouts) state.setTimeoutDuration(gap)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }

  /**
   * Batch twin with SECONDARY-SORT memory behavior: hash-partition by user,
   * sort each partition by (user, ts), then stream a constant-state fold
   * over the sorted run. Per-task heap is O(1) — one open-session
   * accumulator — no matter how many events a hot user has; the former
   * `groupByKey + it.toSeq.sortBy` buffered a user's whole history and
   * would OOM an executor on a 10⁸-event key at 100 TB. Same single
   * shuffle, and the sort rides the shuffle's spill-to-disk machinery.
   */
  def sessionizeBatch(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    val gap = gapMs(gapMinutes)
    implicit val sessionEnc = Encoders.product[Session]
    events
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_ms"))
      .mapPartitions(it => foldSortedPartition(it, gap))
  }

  /** Streaming fold over a (user, ts)-sorted run: emits a closed session as
    * soon as it closes, flushes on user change and at end of input. Memory =
    * the single open [[SessionState]]. */
  private[streaming] def foldSortedPartition(
      events: Iterator[Event], gap: Long): Iterator[Session] = {
    var started = false
    var curUser = 0L
    var open: Option[SessionState] = None
    def flush(): Iterator[Session] = {
      val out = open.map(s => Session(curUser, s.start, s.last, s.n, s.errors, s.sum))
      open = None
      out.iterator
    }
    val main = events.flatMap { e =>
      val userSwitch =
        if (started && e.user_id != curUser) flush() else Iterator.empty
      started = true
      curUser = e.user_id
      val (closed, newOpen) = foldSessions(curUser, Seq(e), gap, open)
      open = newOpen
      userSwitch ++ closed.iterator
    }
    main ++ flush() // lazily evaluated after `main` is exhausted
  }

  /** Batch twin over the events fixture: identical semantics via the same
    * fold, including the final open session per user (a finite input closes
    * everything). Serves as the oracle for the streaming path. */
  def sessionsBatch(spark: SparkSession, sfDir: String, gapMinutes: Int): DataFrame = {
    implicit val eventEnc = Encoders.product[Event]
    val events = Tables.load(spark, sfDir, "events")
      .select(
        col("user_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        col("event_type"), col("value"))
      .as[Event]
    sessionizeBatch(events, gapMinutes).toDF()
  }

  /** Query-pack adapter: 30-minute-gap sessions over the events table.
    * `sum_value` is dropped from the oracle-checked surface: the fold
    * accumulates doubles in event order, whose low bits the SQL oracle's
    * aggregation order won't reproduce; the session structure itself
    * (bounds + counts) is exactly checkable. */
  def sessionQuery(spark: SparkSession, sfDir: String): DataFrame =
    sessionsBatch(spark, sfDir, gapMinutes = 30)
      .select("user_id", "session_start_ms", "session_end_ms", "n_events", "n_errors")
}
