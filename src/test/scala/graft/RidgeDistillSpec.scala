package graft

import graft.operators.RidgeDistill
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ridge distillation: exact moments, the Cramer solve's quantization
  * gate, and the integer scoring fold. */
class RidgeDistillSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("moments match hand sums and the residual gate holds on a tiny corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma."),
      (2L, "alpha alpha alpha alpha"),
      (3L, "one two, three; four five!")).toDF("doc_id", "text")
    val m = RidgeDistill.fit(docs)
    // x1 = ws tokens: 3, 4, 5 ; x0 = 1 each
    assert(m.a(0)(0) == BigInt(3))            // Σ 1
    assert(m.a(0)(1) == BigInt(3 + 4 + 5))    // Σ x1
    assert(m.a(1)(1) == BigInt(9 + 16 + 25))  // Σ x1²
    // y: doc 2 has 1 distinct of 4 tokens → 250000 micro
    val ys = docs.select(RidgeDistill.target(col("text"))).collect().map(_.getLong(0))
    assert(ys.contains(250000L))
    assert(ys.forall(y => y > 0 && y <= 1000000L))
    // the quantization gate must hold for every coefficient
    (0 until RidgeDistill.K).foreach(i => assert(m.gate(i), s"gate $i: resid=${m.resid(i)}"))
  }

  test("fit is deterministic and the fixture gates are green") {
    val m1 = RidgeDistill.fit(spark.read.parquet(s"$sf001/documents.parquet"))
    val m2 = RidgeDistill.fit(spark.read.parquet(s"$sf001/documents.parquet"))
    assert(m1.betaMicro.toSeq == m2.betaMicro.toSeq)
    (0 until RidgeDistill.K).foreach(i => assert(m1.gate(i)))
    // residuals are strictly within the row-sum bound, not merely <= 0
    (0 until RidgeDistill.K).foreach(i => assert(m1.resid(i) + m1.rowSum(i) > 0))
  }

  test("scoring is the exact integer fold of the shipped coefficients") {
    val docs = Seq((7L, "alpha beta gamma")).toDF("doc_id", "text")
    val beta = Array(10L, 100L, 1000L, 5L, 7L)
    val got = RidgeDistill.score(docs, beta).head
    // x = (1, 3 tokens, 16 chars, 0 punct, 16 letters+spaces)
    val expected = 10L * 1 + 100L * 3 + 1000L * 16 + 5L * 0 + 7L * 16
    assert(got.getLong(1) == expected)
  }

  test("query adapters: fit rows all ok, score returns a full ranked page") {
    val fit = RidgeDistill.ridgeFitQuery(spark, sf001).collect()
    assert(fit.length == RidgeDistill.K && fit.forall(_.getBoolean(5)))
    val sc = RidgeDistill.ridgeScoreQuery(spark, sf001).collect()
    assert(sc.length == 100)
    val scores = sc.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted.reverse, "page must be rank-ordered")
  }
}
