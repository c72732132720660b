package graft

import graft.operators.LinkRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-unit PageRank: hand-checked iterations on a tiny graph,
  * transition extraction ordering, and the mass-bound invariants that
  * make the fixed-point arithmetic trustworthy at any scale. */
class LinkRankSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    LinkRank.pageRank(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one iteration on a hand graph matches the integer formulas") {
    // A(1) -> B(2) weight 3, A -> C(3) weight 1, B -> A weight 2
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 2L))
    val scale = LinkRank.Scale
    val n = 3L
    val r0 = scale / n
    val base = (15L * scale) / (100L * n)
    val damp = (r0 * 85L) / 100L
    val expected = Map(
      // A receives all of B's mass; C receives 1/4 of A's; B gets 3/4
      1L -> (base + (damp * 2L) / 2L),
      2L -> (base + (damp * 3L) / 4L),
      3L -> (base + (damp * 1L) / 4L))
    assert(ranks(edges, 1) == expected)
  }

  test("mass bounds: every node ≥ base share, total never exceeds the scale") {
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (3L, 1L, 1L), (4L, 1L, 2L))
    for (it <- Seq(0, 1, 5)) {
      val r = ranks(edges, it)
      assert(r.size == 4)
      assert(r.values.sum <= LinkRank.Scale)
      if (it > 0) {
        val base = (15L * LinkRank.Scale) / (100L * 4L)
        assert(r.values.forall(_ >= base))
        // node 4 is source-only: nothing links to it, so it holds base only
        assert(r(4L) == base)
      }
    }
  }

  test("transitions: per-user consecutive items by (ts, event_id), self-loops dropped") {
    val ev = Seq(
      // user 1 visits 10 -> 10 -> 20 -> 10 (self-loop 10->10 dropped)
      (1L, ts(0), 100L, """{"k": 10}"""),
      (2L, ts(1), 100L, """{"k": 10}"""),
      (3L, ts(2), 100L, """{"k": 20}"""),
      (4L, ts(3), 100L, """{"k": 10}"""),
      // user 2: same-ts pair ordered by event_id: 20 -> 30
      (5L, ts(9), 200L, """{"k": 20}"""),
      (6L, ts(9), 200L, """{"k": 30}"""))
      .toDF("event_id", "ts", "user_id", "props")
    val got = LinkRank.transitions(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 20L, 1L), (20L, 10L, 1L), (20L, 30L, 1L)))
  }

  test("determinism: two full runs over the fixture agree bit-exactly") {
    val q1 = LinkRank.linkRankQuery(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val q2 = LinkRank.linkRankQuery(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(q1 == q2 && q1.nonEmpty)
  }

  test("label propagation: two cliques joined by a weak bridge split into two communities") {
    // clique A = {1,2,3} (heavy), clique B = {10,11,12} (heavy), bridge 3-10 weight 1
    val cl = for {
      g <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L, 12L))
      a <- g; b <- g if a < b
    } yield (a, b, 10L)
    val edges = (cl :+ ((3L, 10L, 1L))).toDF("src", "dst", "w")
    val got = LinkRank.labelPropagation(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 6)
    val commA = Set(1L, 2L, 3L).map(got)
    val commB = Set(10L, 11L, 12L).map(got)
    assert(commA.size == 1 && commB.size == 1 && commA != commB,
      s"expected two communities, got $got")
  }

  test("next-item table: exact probabilities and the full tie order") {
    val ev = Seq(
      (1L, ts(0), 1L, """{"k": 1}"""), (2L, ts(1), 1L, """{"k": 2}"""),
      (3L, ts(2), 1L, """{"k": 1}"""), (4L, ts(3), 1L, """{"k": 3}"""),
      (5L, ts(4), 1L, """{"k": 1}"""), (6L, ts(5), 1L, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "props")
    // from 1: ->2 twice, ->3 once; wout(1) = 3
    val rows = LinkRank.nextItems(ev).filter(col("k") === 1L)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (2L, 2L, 666666L, 1L),
      (3L, 1L, 333333L, 2L)))
  }

  private def ts(m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")
}
