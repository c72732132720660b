package graft

import graft.operators.{PqIndex, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: code shape, determinism, ADC recall and the
  * exactness of the rerank stage. */
class PqIndexSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb = Tables.load(spark, sf001, "embeddings")
  private lazy val model = PqIndex.train(emb, dim = 64, m = 8, k = 16, iters = 2)
  private lazy val truth: Map[(Long, Long), Double] =
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cosine")).toMap

  test("codes: m entries in [0,k), deterministic across encodes") {
    val codes = PqIndex.encode(emb, model).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    assert(codes.size == emb.count())
    codes.values.foreach { cs =>
      assert(cs.length == 8)
      assert(cs.forall(c => c >= 0 && c < 16))
    }
    val again = PqIndex.encode(emb, model).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    assert(again == codes)
  }

  test("ADC finds signal; rerank recovers recall and scores exactly") {
    val queries = emb.filter(col("vec_id") < 5)
    def recall(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
        .count(truth.contains).toDouble / truth.size

    val adc = PqIndex.searchAdc(PqIndex.encode(emb, model), queries, model, k = 10)
      .collect()
    val rr = PqIndex.searchWithRerank(emb, queries, model, k = 10, r = 50)
      .collect()
    val (recAdc, recRr) = (recall(adc), recall(rr))
    assert(recAdc > 0.05, s"ADC recall $recAdc is no better than random")
    assert(recRr >= recAdc, s"rerank recall $recRr must not lose to ADC $recAdc")

    // every reranked hit that the exact search also returned carries the
    // IDENTICAL cosine — the rerank stage is the exact kernel, not ADC
    rr.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      truth.get(key).foreach(c =>
        assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-9))
    }
  }
}
