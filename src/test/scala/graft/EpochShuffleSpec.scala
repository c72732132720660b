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
    val p = BigInt(EpochShuffle.P)
    val aInv = BigInt(a).modInverse(p)
    // a doc id in the scaled-fixture regime (beyond 2^31): key and
    // inverse both stay exact because the products run in BigInt /
    // DECIMAL, never bare Long
    for (doc <- Seq(123456789L, 9000004999L)) {
      val key = (BigInt(doc) * a + b).mod(p)
      val back = ((key - b) * aInv).mod(p)
      assert(back == BigInt(doc), s"inverse failed for $doc: $back")
    }
  }

  test("keys match the column expression for ids beyond 2^31 (scaled fixtures)") {
    val (a, b) = EpochShuffle.epochParams(seed = 20260815L, epoch = 0)
    val docs = Seq(9000004999L, 0L, 42L).toDF("doc_id")
    val got = docs.select(col("doc_id"),
      EpochShuffle.shuffleKey(col("doc_id"), a, b).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (doc, k) =>
      assert(BigInt(k) == (BigInt(doc) * a + b).mod(BigInt(EpochShuffle.P)))
    }
  }

  test("the plan is narrow: no Exchange anywhere in the epoch projection") {
    val q = EpochShuffle.epochShuffleQuery(spark, sf001)
    val plan = q.queryExecution.executedPlan.toString
    // the epoch PROJECTION adds no keyed shuffle; Tables.load's adaptive
    // round-robin scan redistribution (round 19) is the one exchange
    // allowed (absent on any multi-split input)
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"epoch shuffle must not key-shuffle:\n$plan")
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
