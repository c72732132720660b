package graft

import graft.operators.RankMetrics
import org.scalatest.funsuite.AnyFunSuite

class RankMetricsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("nDCG/MRR: hand-computed on a 3-deep ranking with a missed relevant doc") {
    val ranked = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    // doc 9 is relevant but not retrieved — it only strengthens the ideal
    val gains = Seq((2L, 3L), (3L, 1L), (9L, 2L)).toDF("doc_id", "gain")
    val r = RankMetrics.metricsAt(ranked, gains, k = 3).head
    val w = RankMetrics.dcgWeights(3)
    val dcg = micro(0.0 * w(0)) + micro(3.0 * w(1)) + micro(1.0 * w(2))
    val idcg = micro(3.0 * w(0)) + micro(2.0 * w(1)) + micro(1.0 * w(2))
    assert(r.getAs[Long]("dcg_micro") == dcg)
    assert(r.getAs[Long]("idcg_micro") == idcg)
    assert(r.getAs[Long]("ndcg_micro") ==
      math.floor(dcg.toDouble / idcg.toDouble * 1e6 + 0.5).toLong)
    assert(r.getAs[Long]("mrr_micro") == 500000L, "first hit at rank 2")
  }

  test("nDCG: the ideal ranking scores exactly 1.0; empty overlap scores 0") {
    val gains = Seq((1L, 5L), (2L, 3L), (3L, 1L)).toDF("doc_id", "gain")
    val perfect = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val p = RankMetrics.metricsAt(perfect, gains, k = 3).head
    assert(p.getAs[Long]("ndcg_micro") == 1000000L)
    assert(p.getAs[Long]("mrr_micro") == 1000000L)
    val miss = Seq((7L, 1L), (8L, 2L)).toDF("doc_id", "rank")
    val m = RankMetrics.metricsAt(miss, gains, k = 3).head
    assert(m.getAs[Long]("dcg_micro") == 0L && m.getAs[Long]("mrr_micro") == 0L)
  }

  test("search nDCG query: BM25 ranks well against term-presence gains") {
    val r = RankMetrics.searchNdcgQuery(spark, sf01).head
    assert(r.getAs[Long]("idcg_micro") > 0L)
    // BM25 over the exact query terms should rank relevant docs near the
    // top — well above a coin flip
    assert(r.getAs[Long]("ndcg_micro") > 500000L,
      s"ndcg ${r.getAs[Long]("ndcg_micro")}")
    assert(r.getAs[Long]("mrr_micro") == 1000000L,
      "the top BM25 hit must contain a query term")
  }
}
