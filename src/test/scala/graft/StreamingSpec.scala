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
