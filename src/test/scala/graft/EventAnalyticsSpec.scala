package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel reachability DP and the retention triangle, on hand corpora
  * where the answers are checkable by eye. */
class EventAnalyticsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toSeq.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"))

  private def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("a later first-step event can start the only valid chain (greedy would miss it)") {
    // W=60: view@0 leads nowhere, view@100 -> click@150 completes step 2
    val f = EventAnalytics.funnel(ev(
      (1L, 0L, 1L, "view"), (2L, 100L, 1L, "view"), (3L, 150L, 1L, "click")),
      Seq("view", "click"), windowMicros = 60L)
    assert(counts(f) == Map(1L -> 1L, 2L -> 1L))
  }

  test("window boundaries are inclusive at W, steps must be in order") {
    val f = EventAnalytics.funnel(ev(
      (1L, 0L, 1L, "view"), (2L, 60L, 1L, "click"),     // exactly W: counts
      (3L, 0L, 2L, "view"), (4L, 61L, 2L, "click"),     // W+1: does not
      (5L, 10L, 3L, "click"), (6L, 20L, 3L, "view")),   // wrong order
      Seq("view", "click"), windowMicros = 60L)
    assert(counts(f) == Map(1L -> 3L, 2L -> 1L))
  }

  test("three-step chains gate on the previous step's reachable time") {
    val f = EventAnalytics.funnel(ev(
      // user 1: view@0 -> click@50 -> purchase@90: complete
      (1L, 0L, 1L, "view"), (2L, 50L, 1L, "click"), (3L, 90L, 1L, "purchase"),
      // user 2: purchase within W of an UNREACHABLE click (no view before)
      (4L, 50L, 2L, "click"), (5L, 90L, 2L, "purchase"), (6L, 95L, 2L, "view"),
      // user 3: chain stalls — purchase too late after the click
      (7L, 0L, 3L, "view"), (8L, 50L, 3L, "click"), (9L, 200L, 3L, "purchase")),
      Seq("view", "click", "purchase"), windowMicros = 60L)
    assert(counts(f) == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("a repeated step type needs two distinct events (the DP reads strictly-prior state)") {
    val f = EventAnalytics.funnel(ev(
      (1L, 0L, 1L, "view"),                          // one view: depth 1 only
      (2L, 0L, 2L, "view"), (3L, 30L, 2L, "view")),  // two views: depth 2
      Seq("view", "view"), windowMicros = 60L)
    assert(counts(f) == Map(1L -> 2L, 2L -> 1L))
  }

  test("retention: cohort by first week, offsets count active users") {
    val week0 = 1704067200000000L // 2024-01-01 (Monday) in micros
    val day = 86400000000L
    val r = EventAnalytics.retention(ev(
      (1L, week0, 1L, "view"), (2L, week0 + 8 * day, 1L, "view"),
      (3L, week0 + 1 * day, 2L, "view"),
      (4L, week0 + 7 * day, 3L, "view"), (5L, week0 + 9 * day, 3L, "click")))
      .collect().map(r => ((r.getDate(0).toString, r.getLong(1)), r.getLong(2))).toMap
    assert(r == Map(
      ("2024-01-01", 0L) -> 2L,   // users 1 and 2 in week 0
      ("2024-01-01", 1L) -> 1L,   // user 1 returns in week 1
      ("2024-01-08", 0L) -> 1L))  // user 3 cohorts a week later
  }

  test("fixture funnel is monotone and non-empty") {
    val f = counts(EventAnalytics.funnelQuery(spark, sf001))
    assert(f(1L) >= f(2L) && f(2L) >= f(3L) && f(1L) > 0)
  }
}
