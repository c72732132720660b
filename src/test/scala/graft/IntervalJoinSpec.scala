package graft

import org.scalatest.funsuite.{AnyFunSuite => IjLeftBase}

class IntervalJoinLeftSpec extends IjLeftBase with SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("left-outer: matched rows identical to inner, unmatched get null payload once") {
    val inner = graft.operators.IntervalJoin.intervalQuery(spark, sf001)
    val left = graft.operators.IntervalJoin.intervalLeftQuery(spark, sf001)
    val innerSet = inner.collect().map(_.toSeq).toSet
    val leftMatched = left.filter(col("error_id").isNotNull)
      .collect().map(_.toSeq).toSet
    assert(leftMatched == innerSet, "matched rows must equal the inner join")
    // unmatched: exactly once per event with no window, null payload
    val unmatched = left.filter(col("error_id").isNull)
    val events = graft.sources.Tables.load(spark, sf001, "events")
    val matchedIds = inner.select("event_id").distinct().count()
    assert(unmatched.select("event_id").distinct().count() ==
      events.count() - matchedIds)
    assert(unmatched.count() == unmatched.select("event_id").distinct().count())
    // total coverage: every event id appears
    assert(left.select("event_id").distinct().count() == events.count())
  }
}

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interval join semantics: containment, half-open boundaries, granule
  * spill-over, and key isolation. */
class IntervalJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private lazy val right = Seq(
    (1L, 10L, "2024-01-01 00:00:00", "2024-01-03 00:00:00"), // 2-day window
    (1L, 11L, "2024-01-02 00:00:00", "2024-01-05 00:00:00"), // overlapping
    (2L, 20L, "2024-01-01 00:00:00", "2024-01-02 00:00:00")
  ).toDF("k", "iid", "s", "e")
    .select(col("k"), col("iid"),
      to_timestamp(col("s")).as("s"), to_timestamp(col("e")).as("e"))

  private lazy val left = Seq(
    (100L, 1L, "2024-01-01 12:00:00"), // inside 10 only
    (101L, 1L, "2024-01-02 12:00:00"), // inside 10 and 11
    (102L, 1L, "2024-01-03 00:00:00"), // exactly at 10's end (excluded), in 11
    (103L, 1L, "2024-01-01 00:00:00"), // exactly at starts (included)
    (104L, 2L, "2024-01-01 12:00:00"), // key 2
    (105L, 1L, "2024-02-01 00:00:00")  // no window
  ).toDF("id", "k", "t")
    .select(col("id"), col("k"), to_timestamp(col("t")).as("t"))

  // small granule (6h) so windows span many granules
  private lazy val out = IntervalJoin.intervalJoin(
      left, right, "k", "k", "t", "s", "e", Seq("iid"), granuleSeconds = 6 * 3600)
    .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("containment with overlapping intervals") {
    assert(out.filter(_._1 == 100L) == Set((100L, 10L)))
    assert(out.filter(_._1 == 101L) == Set((101L, 10L), (101L, 11L)))
  }

  test("half-open boundaries: end excluded, start included") {
    assert(out.filter(_._1 == 102L) == Set((102L, 11L)))
    assert(out.filter(_._1 == 103L) == Set((103L, 10L)))
  }

  test("keys do not cross-match; points outside all windows drop") {
    assert(out.filter(_._1 == 104L) == Set((104L, 20L)))
    assert(out.filter(_._1 == 105L).isEmpty)
  }

  test("granule width does not change the result") {
    val wide = IntervalJoin.intervalJoin(
        left, right, "k", "k", "t", "s", "e", Seq("iid"), granuleSeconds = 30 * 24 * 3600)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == out)
  }

  test("query adapter is non-empty") {
    assert(IntervalJoin.intervalQuery(spark, sf001).count() > 0)
  }
}
