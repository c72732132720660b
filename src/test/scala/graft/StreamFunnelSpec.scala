package graft

import graft.operators.EventAnalytics
import graft.sources.Tables
import graft.streaming.StreamFunnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel state: chains straddling micro-batches complete
  * exactly as the batch DP computes, and the live counts equal the
  * batch counts over the same (in-order) events. */
class StreamFunnelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("a chain split across batches converts; stream counts equal batch counts") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamfunnel").toString
    val root = s"$base/depths"

    val events = Tables.load(spark, sf001, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .orderBy("ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamFunnel.start(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      steps, windowMicros = 3600L * 1000000L, root, s"$base/ckpt")
    try {
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()

    def table(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val live = table(StreamFunnel.counts(spark, root, steps))
    val batch = table(EventAnalytics.funnel(
      Tables.load(spark, sf001, "events"), steps, 3600L * 1000000L))
    assert(live == batch, s"live=$live batch=$batch")
    assert(live.exists { case (s, _, n) => s == 1L && n > 0 })
  }

  test("repeated step type: one event cannot complete two steps (batch parity)") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamfunnel3").toString
    val root = s"$base/depths"
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamFunnel.start(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      Seq("view", "view"), windowMicros = 60000000L, root, s"$base/ckpt")
    try {
      input.addData((1L, t(0L), 1L, "view")) // one view: depth 1 only
      input.addData((2L, t(0L), 2L, "view"), (3L, t(30000000L), 2L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val counts = StreamFunnel.counts(spark, root, Seq("view", "view"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counts == Map(1L -> 2L, 2L -> 1L),
      "a single event must not complete two consecutive repeated steps")
  }

  test("hand case: view in batch 1 converts on a click in batch 2") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamfunnel2").toString
    val root = s"$base/depths"
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamFunnel.start(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      Seq("view", "click"), windowMicros = 60000000L, root, s"$base/ckpt")
    try {
      input.addData((1L, t(0L), 7L, "view")); q.processAllAvailable()
      input.addData((2L, t(50000000L), 7L, "click")); q.processAllAvailable()
    } finally q.stop()
    val counts = StreamFunnel.counts(spark, root, Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L),
      "the cross-batch chain must convert from state")
  }

  test("boundary-tie redelivery: an event replayed at ts == high-water folds zero times") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamfunnel4").toString
    val root = s"$base/depths"
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamFunnel.start(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      Seq("view", "view"), windowMicros = 60000000L, root, s"$base/ckpt")
    try {
      input.addData((5L, t(10000000L), 1L, "view")); q.processAllAvailable()
      // at-least-once redelivery of the SAME event: a >=-on-ts filter would
      // fold it against post-event state and complete step 2 from one event
      input.addData((5L, t(10000000L), 1L, "view")); q.processAllAvailable()
    } finally q.stop()
    val counts = StreamFunnel.counts(spark, root, Seq("view", "view"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 0L),
      s"a replayed event must not advance the funnel, got $counts")
  }

  test("funnel compaction folds per-user max depth; counts unchanged; guarded") {
    import graft.streaming.{DeltaLayout, StreamFunnel}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-funnel-compact").toString
    Seq((1L, 1), (2L, 2)).toDF("userId", "depth")
      .write.parquet(s"$root/delta=b0")
    Seq((1L, 3), (3L, 1)).toDF("userId", "depth")
      .write.parquet(s"$root/delta=b1")
    val steps = Seq("a", "b", "c")
    def cnt() = StreamFunnel.counts(spark, root, steps).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val before = cnt()
    assert(before == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))

    // fold = the same per-user MAX the read-merge applies; counts and
    // slice layout both collapse to one base generation
    StreamFunnel.compact(spark, root)
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("delta="))
      .map(_.getName).toSeq
    assert(dirs == Seq("delta=base@1"))
    assert(cnt() == before, "compaction must not change the step counts")

    // guarded: a depth slice landing after the fold's snapshot aborts
    // loudly, nothing swept; the post-quiesce compact folds all
    Seq((4L, 1)).toDF("userId", "depth").write.parquet(s"$root/delta=b2")
    val snap = DeltaLayout.liveDirs(spark, root) // base@1 + b2
    Seq((5L, 2)).toDF("userId", "depth").write.parquet(s"$root/delta=b3")
    val e = intercept[IllegalStateException](
      StreamFunnel.compactFrom(spark, root, snap))
    assert(e.getMessage.contains("funnel compact raced a concurrent writer"))
    assert(new java.io.File(s"$root/delta=b2").exists() &&
      new java.io.File(s"$root/delta=b3").exists())
    StreamFunnel.compact(spark, root)
    assert(cnt() == Map(1L -> 5L, 2L -> 3L, 3L -> 1L))
  }

  test("buffered: a cross-batch REGRESSED event still converts (watermark ordering)") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamfunnel5").toString
    val root = s"$base/depths"
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamFunnel.startBuffered(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      Seq("view", "click"), windowMicros = 3600L * 1000000L,
      lateness = "1 hour", root, s"$base/ckpt")
    try {
      // the CLICK arrives first; the VIEW arrives a batch later with an
      // EARLIER timestamp (still inside the 1-hour lateness bound) — the
      // eager mode documents this as a drop; the buffered mode must hold
      // both past the watermark and fold in ts order
      input.addData((2L, t(3000L * 1000000L), 7L, "click")); q.processAllAvailable()
      input.addData((1L, t(1000L * 1000000L), 7L, "view")); q.processAllAvailable()
      // advance the watermark past both events (flush user -1 never matches
      // a step), then one more batch so the event-time timeout fires
      input.addData((90L, t(10200L * 1000000L), -1L, "flush"))
      q.processAllAvailable()
      input.addData((91L, t(10300L * 1000000L), -1L, "flush"))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream wedged: ${q.exception}")
    } finally q.stop()
    val counts = StreamFunnel.counts(spark, root, Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L),
      s"the regressed view must convert via the watermark buffer, got $counts")
  }

  test("buffered: randomly-permuted micro-batch assignment equals the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamfunnel6").toString
    val root = s"$base/depths"

    val ordered = Tables.load(spark, sf001, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val events = new scala.util.Random(1213L).shuffle(ordered.toSeq) // any delivery order
    val maxTs = ordered.map(_._2.getTime).max

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamFunnel.startBuffered(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      steps, windowMicros = 3600L * 1000000L,
      lateness = "3650 days", root, s"$base/ckpt")
    try {
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      // watermark past every event, then one more batch for the timeouts
      input.addData((-90L, new java.sql.Timestamp(maxTs + 3660L * 86400000L), -1L, "flush"))
      q.processAllAvailable()
      input.addData((-91L, new java.sql.Timestamp(maxTs + 3661L * 86400000L), -1L, "flush"))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream wedged: ${q.exception}")
    } finally q.stop()

    def table(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val live = table(StreamFunnel.counts(spark, root, steps))
    val batch = table(EventAnalytics.funnel(
      Tables.load(spark, sf001, "events"), steps, 3600L * 1000000L))
    assert(live == batch, s"live=$live batch=$batch")
    assert(live.exists { case (s, _, n) => s == 1L && n > 0 })
  }
}
