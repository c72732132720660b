package graft

import graft.operators.DriftMonitor
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DriftMonitorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("drift: identical snapshots score exactly zero") {
    val snap = Seq(1L, 1L, 2L, 3L).toDF("band")
    val r = DriftMonitor.snapshotDrift(snap, snap).collect()
    assert(r.map(_.getAs[Long]("term_micro")).sum == 0L)
  }

  test("drift: disjoint supports score the maximum (2.0)") {
    val a = Seq(1L, 1L, 2L).toDF("band")
    val b = Seq(5L, 6L).toDF("band")
    val r = DriftMonitor.snapshotDrift(a, b).collect()
    // every band is one-sided: term = p²/p = p (or q), totals sum to 2
    assert(r.map(_.getAs[Long]("term_micro")).sum == 2000000L)
  }

  test("drift: hand-computed mixed shift") {
    // A: band1 ×3, band2 ×1; B: band1 ×1, band2 ×3
    // p = (.75, .25), q = (.25, .75): term = (.5)²/1 = .25 per band
    val a = Seq(1L, 1L, 1L, 2L).toDF("band")
    val b = Seq(1L, 2L, 2L, 2L).toDF("band")
    val r = DriftMonitor.snapshotDrift(a, b).collect()
      .map(x => x.getAs[Long]("band") -> x.getAs[Long]("term_micro")).toMap
    assert(r == Map(1L -> 250000L, 2L -> 250000L))
  }

  test("fixture drift query: bands complete, totals consistent, drift small") {
    val r = DriftMonitor.corpusDriftQuery(spark, sf01).collect()
    assert(r.nonEmpty)
    val total = r.map(_.getAs[Long]("term_micro")).sum
    // even/odd halves of the same corpus: near-identical distributions
    assert(total < 100000L, s"even/odd split should barely drift: $total")
    assert(r.map(_.getAs[Long]("n_a")).sum + r.map(_.getAs[Long]("n_b")).sum == 500L)
  }
}
