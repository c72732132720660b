package graft

import graft.streaming.EventMonitor
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite with SparkTestBase {

  test("streaming monitor over events == batch twin") {
    val streamed = EventMonitor.runOnce(spark, sf001)
      .select("window_start", "event_type", "n_events", "n_errors")
    val batch = EventMonitor.transform(
        graft.sources.Tables.load(spark, sf001, "events"))
      .select("window_start", "event_type", "n_events", "n_errors")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream interval join == batch interval join") {
    val streamed = graft.streaming.StreamIntervalJoin.runOnce(spark, sf001)
    val batch = graft.operators.IntervalJoin.intervalQuery(spark, sf001)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0,
      "stream emitted a pair the batch twin does not have")
    assert(batch.exceptAll(streamed).count() == 0,
      "stream missed a pair the batch twin has (state evicted too early?)")
    // stream-join result also equals the shared transform run in batch mode
    val viaTransform = graft.streaming.StreamIntervalJoin.transform(
      graft.sources.Tables.load(spark, sf001, "events"))
    assert(viaTransform.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(viaTransform).count() == 0)
  }

  test("left-outer stream-stream join: nulls are true non-matches, matches equal inner") {
    val outer = graft.streaming.StreamIntervalJoin.runOnce(spark, sf001, "left_outer")
    val inner = graft.operators.IntervalJoin.intervalQuery(spark, sf001)
    // the matched slice is exactly the inner join
    val matched = outer.filter(col("error_id").isNotNull)
    assert(matched.exceptAll(inner).count() == 0)
    assert(inner.exceptAll(matched).count() == 0)
    // every null row is a genuine batch non-match (an event with no
    // same-user error window containing it); completeness of nulls is NOT
    // asserted — the trailing watermark horizon legitimately stays buffered
    val matchedIds = inner.select("event_id").distinct()
    assert(outer.filter(col("error_id").isNull)
      .join(matchedIds, Seq("event_id"), "left_semi").count() == 0,
      "a null row surfaced for an event the batch twin matches")
  }

  test("full-outer stream-stream join: matched == inner, right-null slice " +
      "empty on the self-feeding fixture, left-nulls true non-matches") {
    val outer = graft.streaming.StreamIntervalJoin.runOnce(spark, sf001, "full_outer")
    val inner = graft.operators.IntervalJoin.intervalQuery(spark, sf001)
    val matched = outer.filter(col("error_id").isNotNull && col("event_id").isNotNull)
    assert(matched.exceptAll(inner).count() == 0)
    assert(inner.exceptAll(matched).count() == 0)
    // every error event is itself a left-side event inside its own window,
    // so no error window can go unmatched on this query shape
    assert(outer.filter(col("event_id").isNull).count() == 0,
      "right-null row emitted though every error self-matches")
    // left-padding behaves exactly as in left_outer
    val matchedIds = inner.select("event_id").distinct()
    assert(outer.filter(col("error_id").isNull)
      .join(matchedIds, Seq("event_id"), "left_semi").count() == 0)
  }

  test("full-outer join over two independent streams pads BOTH directions; " +
      "watermark drops late rows and the state store reports it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val lIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val events = lIn.toDF().toDF("event_id", "user_id", "ts")
    val errors = rIn.toDF().toDF("event_id", "user_id", "ts")
    val q = graft.streaming.StreamIntervalJoin
      .transformStreams(events, errors, "full_outer")
      .writeStream.outputMode("append").format("memory")
      .queryName("fo_synth").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // user 1 emits an event with no error window around it (left pad);
      // user 99's error sees no user-99 event ever (right pad)
      lIn.addData((1L, 1L, t("2024-01-01 00:00:00")))
      rIn.addData((100L, 99L, t("2024-01-01 00:05:00")))
      q.processAllAvailable()
      // advance BOTH watermarks (global watermark = min of the sides)
      lIn.addData((2L, 2L, t("2024-01-01 06:00:00")))
      rIn.addData((101L, 98L, t("2024-01-01 06:00:00")))
      q.processAllAvailable()
      // late left event: the join's left state watermark on this condition
      // is watermark − 30min = 04:30; 01:00 is far behind it → dropped and
      // counted, never joined against error state
      lIn.addData((5L, 1L, t("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // final advance so no-data batches flush all provable non-matches
      lIn.addData((6L, 3L, t("2024-01-01 12:00:00")))
      rIn.addData((102L, 97L, t("2024-01-01 12:00:00")))
      q.processAllAvailable()

      val out = spark.table("fo_synth").collect()
      // left padding: user 1's event has no error window around it
      assert(out.exists(r => r.getAs[Any]("event_id") == 1L &&
        r.getAs[Any]("error_id") == null),
        s"expected a left-padded row for event 1: ${out.toSeq}")
      // right padding: the unmatched error surfaces with a null event and
      // keeps its user via the coalesce
      assert(out.exists(r => r.getAs[Any]("event_id") == null &&
        r.getAs[Any]("error_id") == 100L && r.getAs[Any]("user_id") == 99L),
        s"expected a right-padded row for error 100: ${out.toSeq}")
      // no spurious matches anywhere (no user overlaps between the sides)
      assert(!out.exists(r => r.getAs[Any]("event_id") != null &&
        r.getAs[Any]("error_id") != null), s"impossible match: ${out.toSeq}")
      // state metrics: the join reports the late-row drop and held state
      val stateOps = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      assert(stateOps.nonEmpty, "no state operator progress reported")
      assert(stateOps.exists(_.numRowsDroppedByWatermark > 0),
        s"late row not counted as dropped: " +
          s"${stateOps.map(_.numRowsDroppedByWatermark).toSeq}")
      assert(stateOps.map(_.numRowsTotal).max > 0, "join kept no state at all")
    } finally q.stop()
  }

  test("error channel counts only error events") {
    val out = EventMonitor.runOnce(spark, sf001)
    val totalErrors = out.agg(sum("n_errors")).collect().head.getLong(0)
    val expected = graft.sources.Tables.load(spark, sf001, "events")
      .filter(col("event_type") === "error").count()
    assert(totalErrors == expected)
    // non-error rows report zero errors
    assert(out.filter(col("event_type") =!= "error" && col("n_errors") =!= 0).count() == 0)
  }
}
