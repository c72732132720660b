package graft

import graft.operators.EpochShuffle
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Epoch reshuffle: the affine map must be a bijection per epoch, vary
  * across epochs, invert algebraically, and compute with zero shuffles. */
class EpochShuffleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("each epoch's keys are distinct (bijection) and epochs disagree") {
    val docs = spark.range(0, 5000).select(col("id").as("doc_id"))
    val out = EpochShuffle.epochOrders(docs, seed = 7L, epochs = 3).cache()
    val perEpoch = out.groupBy("epoch")
      .agg(countDistinct(col("shuffle_key")).as("nd"), count(lit(1)).as("n"))
      .collect()
    assert(perEpoch.length == 3 && perEpoch.forall(r => r.getLong(1) == r.getLong(2)))
    // the orders genuinely differ: same doc, different keys across epochs
    val keysOfDoc = out.filter(col("doc_id") === 42L)
      .select("shuffle_key").collect().map(_.getLong(0)).toSet
    assert(keysOfDoc.size == 3)
    out.unpersist()
  }

  test("the permutation inverts algebraically: resume needs no lookup table") {
    val (a, b) = EpochShuffle.epochParams(seed = 99L, epoch = 1)
    val p = EpochShuffle.P
    val aInv = BigInt(a).modInverse(BigInt(p)).toLong
    val doc = 123456789L
    val key = java.lang.Math.floorMod(doc * a + b, p)
    val back = java.lang.Math.floorMod((key - b + p) % p * aInv % p, p)
    // (key - b) * a^-1 mod p — modular products kept inside Long via BigInt
    val backExact = ((BigInt(key) - BigInt(b)) * BigInt(aInv)).mod(BigInt(p)).toLong
    assert(backExact == doc, s"inverse failed: $back / $backExact")
  }

  test("the plan is narrow: no Exchange anywhere in the epoch projection") {
    val q = EpochShuffle.epochShuffleQuery(spark, sf001)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epoch shuffle must not shuffle:\n$plan")
    assert(q.count() > 0)
  }

  test("params are seed-deterministic and epoch-distinct") {
    val ps = (0 until 5).map(EpochShuffle.epochParams(20260815L, _))
    assert(ps == (0 until 5).map(EpochShuffle.epochParams(20260815L, _)))
    assert(ps.distinct.size == 5)
    assert(ps.forall { case (a, b) =>
      a > 0 && a < EpochShuffle.P && b >= 0 && b < EpochShuffle.P })
  }
}
