package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("cosine_sim kernel: pinned values and bounds") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0),
      (Array(0f, 0f), Array(1f, 1f), 0.0)   // zero-norm guard
    ).toDF("a", "b", "expected")
    df.select(VectorFunctions.cosine_sim(col("a"), col("b")).as("c"), col("expected"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
      }
  }

  test("brute-force top-k: k rows per query, descending, self excluded, |cos|<=1") {
    val out = Similarity.bruteForceQuery(spark, sf001).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 20)
      assert(!rows.exists(_.getAs[Long]("vec_id") == q))
      val cos = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.sameElements(cos.sortBy(-_)))
      assert(cos.forall(c => c <= 1.0 + 1e-9 && c >= -1.0 - 1e-9))
    }
  }

  test("LSH top-k: results are a subset of correct cosine scores, same bucket only") {
    val exact = Similarity.bruteForceQuery(spark, sf001)
      .select("query_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshQuery(spark, sf001).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      // any (q, v) scored by LSH must carry the identical cosine value
      exact.get(key).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-9))
    }
  }
}
