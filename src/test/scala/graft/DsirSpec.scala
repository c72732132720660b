package graft

import graft.operators.Dsir
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling: driver λ arithmetic is pinned, the
  * selection enriches target-like documents, and the scoring pass stays
  * shuffle-free (it must be a narrow fold at 100 TB). */
class DsirSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  // target docs speak "alpha beta gamma"; raw doc 10 shares that
  // vocabulary, raw docs 11/12 are disjoint noise
  private val hand = docs(
    (1L, "tgt", "alpha beta gamma alpha beta"),
    (2L, "tgt", "beta gamma alpha beta gamma"),
    (10L, "raw", "alpha beta gamma beta gamma"),
    (11L, "raw", "delta epsilon zeta eta theta"),
    (12L, "raw", "iota kappa lambda mu nu"))

  test("lambda: micro-quantized smoothed log-ratio, exact driver arithmetic") {
    val tgt = Array(3L, 0L, 1L)
    val raw = Array(0L, 5L, 1L)
    val lam = Dsir.lambdaMicro(tgt, raw, tgtTotal = 4L, rawTotal = 6L)
    def expect(ct: Long, cr: Long): Long =
      math.floor((StrictMath.log((ct + 1.0) / 7.0) -
        StrictMath.log((cr + 1.0) / 9.0)) * 1e6 + 0.5).toLong
    assert(lam.toSeq == Seq(expect(3, 0), expect(0, 5), expect(1, 1)))
    // monotone: more target mass raises λ, more raw mass lowers it
    assert(lam(0) > lam(2) && lam(2) > lam(1))
  }

  test("bucket counts: occurrence totals split target/raw, short docs fall back") {
    val withShort = hand.union(docs((13L, "raw", "solo")))
    val counts = Dsir.bucketCounts(withShort, targetSource = "tgt")
    val (tgtTotal, rawTotal) = {
      val r = counts.agg(sum("tgt_n"), sum("raw_n")).head
      (r.getLong(0), r.getLong(1))
    }
    // 2 target docs x 5 tokens -> 4 bigrams each; 3 raw 5-token docs x 4
    // bigrams + the 1-token doc's single whole-doc fallback gram
    assert(tgtTotal == 8L)
    assert(rawTotal == 13L)
    assert(counts.filter(col("bucket") < 0 ||
      col("bucket") >= Dsir.DefaultBuckets).count() == 0L)
  }

  test("fit + select: target-vocabulary raw doc outranks disjoint raw docs") {
    val model = Dsir.fit(hand, targetSource = "tgt")
    assert(model.targetTotal == 8L && model.rawTotal == 12L)
    val scored = Dsir.score(hand.filter(col("source") === "raw"), model)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored(10L) > scored(11L), s"target-like doc must win: $scored")
    assert(scored(10L) > scored(12L), s"target-like doc must win: $scored")
    val top = Dsir.selectTopK(hand.filter(col("source") === "raw"), model, 1)
      .head
    assert(top.getLong(0) == 10L)
  }

  test("score covers every document (fallback grams) and stays shuffle-free") {
    val withShort = hand.union(docs((13L, "raw", "solo"), (14L, "raw", "")))
    val model = Dsir.fit(withShort, targetSource = "tgt")
    val scored = Dsir.score(withShort, model)
    assert(scored.count() == 7L)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be narrow:\n$plan")
  }

  test("scoring is stateless: a streamed corpus scores identically to batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val model = Dsir.fit(hand, targetSource = "tgt")
    val batch = Dsir.score(hand, model).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val input = MemoryStream[(Long, String, String)]
    val q = Dsir.score(
      input.toDF().toDF("doc_id", "source", "text"), model)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      input.addData(hand.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dsir_stream").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("selection is TakeOrdered (no global sort) with the full tiebreak") {
    val model = Dsir.fit(hand, targetSource = "tgt")
    val plan = Dsir.selectTopK(hand, model, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k:\n$plan")
  }
}
