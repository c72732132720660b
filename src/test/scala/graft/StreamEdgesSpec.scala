package graft

import graft.operators.LinkRank
import graft.sources.Tables
import graft.streaming.StreamEdges
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming edge extraction must equal the batch pipeline EXACTLY —
  * including transitions that straddle micro-batch boundaries — and the
  * fresh rank must equal the batch rank over the same events. */
class StreamEdgesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("stream == batch: cross-batch boundary edges survive; rank agrees; compact folds") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamedges").toString
    val root = s"$base/edges"

    val events = Tables.load(spark, sf001, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("props"))
      .orderBy("ts", "event_id") // CDC-style in-order delivery
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamEdges.start(
      input.toDF().toDF("event_id", "ts", "user_id", "props"),
      root, checkpoint = s"$base/ckpt")
    try {
      // three chunks → boundary transitions exist between every pair
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()

    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchEdges = edgeSet(
      LinkRank.transitions(Tables.load(spark, sf001, "events")))
    val streamed = edgeSet(StreamEdges.mergedEdges(spark, root))
    assert(streamed == batchEdges,
      s"missing=${(batchEdges -- streamed).take(5)} extra=${(streamed -- batchEdges).take(5)}")

    val batchRank = LinkRank.pageRank(
      LinkRank.transitions(Tables.load(spark, sf001, "events")), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fresh = StreamEdges.freshRank(spark, root, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fresh == batchRank, "fresh rank must equal the batch rank bit-exactly")

    // compaction folds the slices without changing the merged edges,
    // committing atomically as the next base generation
    StreamEdges.compact(spark, root)
    assert(edgeSet(StreamEdges.mergedEdges(spark, root)) == batchEdges)
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("delta="))
      .map(_.getName).toSeq
    assert(dirs.length == 1 && dirs.head.startsWith("delta=base@"))
  }

  test("edge compact aborts loudly on a slice landing after its snapshot; merged edges intact") {
    import graft.streaming.DeltaLayout
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-edges-race").toString
    def writeSlice(id: Long, rows: (Long, Long, Long)*): Unit =
      rows.toSeq.toDF("src", "dst", "w").write.parquet(s"$root/delta=b$id")
    writeSlice(0L, (1L, 2L, 1L), (2L, 3L, 1L))
    writeSlice(1L, (1L, 2L, 2L))

    // the fold fixes its input HERE; a slice lands during the merge
    val snapshot = DeltaLayout.liveDirs(spark, root)
    writeSlice(2L, (3L, 4L, 5L))
    val e = intercept[IllegalStateException](
      StreamEdges.compactFrom(spark, root, snapshot))
    assert(e.getMessage.contains("edge compact raced a concurrent writer"))

    // nothing folded, nothing swept: the merged view still sums ALL slices
    def merged() = StreamEdges.mergedEdges(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged() == Set((1L, 2L, 3L), (2L, 3L, 1L), (3L, 4L, 5L)))

    // writer quiesced: the next compact folds everything
    StreamEdges.compact(spark, root)
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("delta="))
      .map(_.getName).toSeq
    assert(dirs == Seq("delta=base@2"))
    assert(merged() == Set((1L, 2L, 3L), (2L, 3L, 1L), (3L, 4L, 5L)))
  }

  test("a null item is a chain breaker (as batch lag), not a crash or an invented edge") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamedges-null").toString
    val root = s"$base/edges"
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamEdges.start(
      input.toDF().toDF("event_id", "ts", "user_id", "props"),
      root, checkpoint = s"$base/ckpt")
    try {
      // 1 -> (malformed) -> 2: the malformed visit must BREAK the chain
      input.addData(
        (1L, t(0L), 9L, """{"k": 1}"""),
        (2L, t(1000L), 9L, """not-json"""),
        (3L, t(2000L), 9L, """{"k": 2}"""))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream wedged: ${q.exception}")
    } finally q.stop()
    // the slice set has no committed data rows at all — the explicit
    // probe schema reads it as empty where inference would throw
    val got = StreamEdges.mergedEdges(spark, root).collect()
    assert(got.isEmpty, s"no edge may cross the malformed visit, got ${got.toSeq}")
  }

  test("buffered: a cross-batch REGRESSED event INSERTS its edges (watermark ordering)") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamedges-buf").toString
    val root = s"$base/edges"
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamEdges.startBuffered(
      input.toDF().toDF("event_id", "ts", "user_id", "props"),
      root, checkpoint = s"$base/ckpt", lateness = "1 hour")
    try {
      // the LATER event arrives first; the EARLIER one lands a batch later
      // (inside the 1-hour bound). The eager mode documents this as a drop
      // — zero edges; the buffered mode must hold both past the watermark
      // and emit the 1→2 edge in (ts, event_id) order
      input.addData((2L, t(3000L * 1000000L), 7L, """{"k": 2}"""))
      q.processAllAvailable()
      input.addData((1L, t(1000L * 1000000L), 7L, """{"k": 1}"""))
      q.processAllAvailable()
      // advance the watermark past both events (user -1's null-k flushes
      // break their own chain), then one more batch so timeouts fire
      input.addData((90L, t(10200L * 1000000L), -1L, "{}"))
      q.processAllAvailable()
      input.addData((91L, t(10300L * 1000000L), -1L, "{}"))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream wedged: ${q.exception}")
    } finally q.stop()
    val got = StreamEdges.mergedEdges(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L)),
      s"the regressed event must insert its edge via the watermark buffer, got $got")
  }

  test("buffered: randomly-permuted micro-batch assignment equals the batch edge table") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamedges-perm").toString
    val root = s"$base/edges"

    val ordered = Tables.load(spark, sf001, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("props"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val events = new scala.util.Random(1415L).shuffle(ordered.toSeq) // any delivery order
    val maxTs = ordered.map(_._2.getTime).max

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamEdges.startBuffered(
      input.toDF().toDF("event_id", "ts", "user_id", "props"),
      root, checkpoint = s"$base/ckpt", lateness = "3650 days")
    try {
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      // watermark past every event, then one more batch for the timeouts
      input.addData((-90L, new java.sql.Timestamp(maxTs + 3660L * 86400000L), -1L, "{}"))
      q.processAllAvailable()
      input.addData((-91L, new java.sql.Timestamp(maxTs + 3661L * 86400000L), -1L, "{}"))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream wedged: ${q.exception}")
    } finally q.stop()

    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchEdges = edgeSet(
      LinkRank.transitions(Tables.load(spark, sf001, "events")))
    val streamed = edgeSet(StreamEdges.mergedEdges(spark, root))
    assert(streamed == batchEdges,
      s"missing=${(batchEdges -- streamed).take(5)} extra=${(streamed -- batchEdges).take(5)}")
  }

  test("at-least-once redelivery: a replayed batch adds no edge weight (boundary ties included)") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamedges-redeliver").toString
    val root = s"$base/edges"
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    // two events SHARE the boundary timestamp — the tie a >=-on-ts filter
    // lets back in: replaying (id=2, ts=1000) after state advanced to
    // (id=3, ts=1000) would emit a time-reversed 3→2 edge and re-folding
    // (id=3) would double-count 2→3
    val batch = Seq(
      (1L, t(0L), 9L, """{"k": 1}"""),
      (2L, t(1000L), 9L, """{"k": 2}"""),
      (3L, t(1000L), 9L, """{"k": 3}"""))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamEdges.start(
      input.toDF().toDF("event_id", "ts", "user_id", "props"),
      root, checkpoint = s"$base/ckpt")
    try {
      input.addData(batch: _*); q.processAllAvailable()
      input.addData(batch: _*); q.processAllAvailable() // full redelivery
      assert(q.exception.isEmpty, s"stream wedged: ${q.exception}")
    } finally q.stop()
    val got = StreamEdges.mergedEdges(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L)),
      s"replay must be a no-op, got $got")
  }
}
