package graft

import graft.operators.HybridSearch
import org.scalatest.funsuite.AnyFunSuite

class HybridSearchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pts(rank: Long, k: Int = 60): Long =
    math.floor(HybridSearch.RrfScale.toDouble / (k.toDouble + rank)).toLong

  test("RRF: a doc in both legs outscores single-leg docs at better ranks") {
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((3L, 1L), (4L, 2L)).toDF("doc_id", "rank")
    val rows = HybridSearch.fuseTopK(lex, sem, k = 10).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).head == 3L,
      "both-leg doc 3 (ranks 3+1) must beat lex-rank-1 doc 1")
    val r3 = rows.find(_.getAs[Long]("doc_id") == 3L).get
    assert(r3.getAs[Long]("rrf_score") == pts(3) + pts(1))
    assert(r3.getAs[Long]("lex_rank") == 3L && r3.getAs[Long]("sem_rank") == 1L)
    val r1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
    assert(r1.getAs[Long]("rrf_score") == pts(1) && r1.getAs[Long]("sem_rank") == 0L,
      "leg absence contributes zero points and reports rank 0")
  }

  test("RRF: equal fused scores break ties by ascending doc_id; k bounds output") {
    val lex = Seq((10L, 1L)).toDF("doc_id", "rank")
    val sem = Seq((5L, 1L)).toDF("doc_id", "rank")
    val rows = HybridSearch.fuseTopK(lex, sem, k = 10).collect()
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")))
      .toSeq == Seq((5L, 1L), (10L, 2L)))
    val many = (1L to 30L).map(i => (i, i)).toDF("doc_id", "rank")
    assert(HybridSearch.fuseTopK(many, many.limit(0), k = 7).count() == 7L)
  }

  test("hybrid query on the fixture: top-20, ranks dense, legs consistent") {
    val rows = SparkEntry.queries("q_hybrid_search")(spark, sf01).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 20L))
    rows.foreach { r =>
      val lr = r.getAs[Long]("lex_rank"); val sr = r.getAs[Long]("sem_rank")
      assert(lr >= 0L && lr <= 20L && sr >= 0L && sr <= 20L)
      assert(lr > 0L || sr > 0L, "every fused doc came from at least one leg")
      val expect = (if (lr > 0) pts(lr) else 0L) + (if (sr > 0) pts(sr) else 0L)
      assert(r.getAs[Long]("rrf_score") == expect)
    }
    // scores non-increasing in rank order
    val scores = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
