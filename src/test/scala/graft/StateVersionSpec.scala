package graft

import graft.streaming.{StateVersion, StreamFunnel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming-state evolution discipline: every stateful fold's state
  * carries (stateVersion, reserved) so the NEXT semantic or data change
  * resumes existing checkpoints instead of stranding them (round 13's
  * high-water-pair addition required fresh dirs — the break this closes). */
class StateVersionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("tolerant defaults: absent reserved keys read as the pre-existence value") {
    assert(StateVersion.reservedLong(Map.empty, "foldedCount", 0L) == 0L)
    assert(StateVersion.reservedLong(Map("foldedCount" -> "7"), "foldedCount", 0L) == 7L)
    assert(StateVersion.reservedString(Map.empty, "mode", "eager") == "eager")
    assert(StateVersion.reservedString(Map("mode" -> "buffered"), "mode", "x") == "buffered")
    // a present-but-garbage value is corruption, not version skew: loud
    val e = intercept[IllegalStateException](
      StateVersion.reservedLong(Map("foldedCount" -> "not-a-long"), "foldedCount", 0L))
    assert(e.getMessage.contains("foldedCount"))
  }

  test("rollback guard: restoring FUTURE-versioned state fails loudly") {
    // the other direction of the evolution contract: an older binary must
    // not silently fold state a future semantic version wrote (the
    // reserved-bag carry cannot preserve meaning this binary predates)
    assert(StateVersion.checkRestored(Option.empty[Int])(identity).isEmpty)
    assert(StateVersion.checkRestored(Some(StateVersion.Current))(identity)
      .contains(StateVersion.Current))
    assert(StateVersion.checkRestored(Some(1))(identity).contains(1),
      "older versions restore fine — the tolerant-default path")
    val e = intercept[IllegalStateException](
      StateVersion.checkRestored(Some(StateVersion.Current + 1))(identity))
    assert(e.getMessage.contains("roll the binary forward"))
  }

  test("restored state round-trips across a query RESTART from the same checkpoint") {
    // the operational contract the version+reserved fields exist to keep:
    // stop a stateful query, start a NEW query over the SAME checkpoint,
    // and the restored state (version field, reserved map, DP arrays)
    // decodes and continues the fold — a view folded before the restart
    // converts on a click folded after it
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-statever").toString
    val root = s"$base/depths"
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    val steps = Seq("view", "click")

    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q1 = StreamFunnel.start(
      in.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      steps, windowMicros = 60000000L, root, s"$base/ckpt")
    try {
      in.addData((1L, t(0L), 7L, "view")); q1.processAllAvailable()
    } finally q1.stop()

    // NEW query over the SAME source + checkpoint: Spark restores the
    // offsets and the flatMapGroupsWithState state rows written by q1
    val q2 = StreamFunnel.start(
      in.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      steps, windowMicros = 60000000L, root, s"$base/ckpt")
    try {
      in.addData((2L, t(50000000L), 7L, "click"))
      q2.processAllAvailable()
      assert(q2.exception.isEmpty, s"resume failed: ${q2.exception}")
    } finally q2.stop()

    val counts = StreamFunnel.counts(spark, root, steps)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L),
      s"the restored state must complete the cross-restart chain, got $counts")
  }
}
