package graft

import graft.operators.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics: latest at-or-before match, exact-time inclusion,
  * tie resolution, and left rows with no match. */
class AsofJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val right = Seq(
    // (key, time, version, price)
    (1L, 10L, 100L, 1.0),
    (1L, 20L, 200L, 2.0),
    (1L, 20L, 201L, 2.5), // same (key, time): greatest version must win
    (1L, 30L, 300L, 3.0),
    (2L, 15L, 150L, 9.0)
  ).toDF("k", "t", "version", "price")

  private lazy val left = Seq(
    (10L, 1L, 5L),   // before any version -> no match
    (11L, 1L, 10L),  // exactly at t=10 -> matches version 100
    (12L, 1L, 25L),  // between 20 and 30 -> tie at 20 resolved to 201
    (13L, 1L, 99L),  // after everything -> latest (300)
    (14L, 2L, 15L),  // other key, exact time
    (15L, 3L, 50L)   // key with no right rows -> no match
  ).toDF("id", "k", "t")

  private lazy val out = AsofJoin.asof(
      left, right, "k", "k", "t", "t", Seq("version", "price"), "version")
    .collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))).toMap

  test("latest at-or-before version is attached") {
    assert(out(11L) == Some((100L, 1.0)))
    assert(out(13L) == Some((300L, 3.0)))
    assert(out(14L) == Some((150L, 9.0)))
  }

  test("timestamp ties: greatest right order wins") {
    assert(out(12L) == Some((201L, 2.5)))
  }

  test("no version at-or-before -> null payload (left-join semantics)") {
    assert(out(10L).isEmpty)
    assert(out(15L).isEmpty)
  }

  test("every left row survives exactly once") {
    assert(out.keySet == Set(10L, 11L, 12L, 13L, 14L, 15L))
  }

  test("query adapter is non-empty and matches orders manually for one event") {
    val df = AsofJoin.asofQuery(spark, sf001)
    assert(df.count() > 0)
  }

  test("colliding payload or reserved meta names are rejected up front") {
    // payload "t" already exists on the left -> ambiguous output
    val e1 = intercept[IllegalArgumentException](
      AsofJoin.asof(left, right, "k", "k", "t", "t", Seq("t"), "version"))
    assert(e1.getMessage.contains("collides"))
    // a left column named _k would be clobbered by the internal meta column
    val e2 = intercept[IllegalArgumentException](
      AsofJoin.asof(left.withColumnRenamed("id", "_k"),
        right, "k", "k", "t", "t", Seq("version"), "version"))
    assert(e2.getMessage.contains("reserved"))
  }
}
