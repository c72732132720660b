package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val doc = "the quick brown fox jumps over the lazy dog and runs far away today"
  private val nearDoc = "the quick brown fox jumps over the lazy dog and runs far away tonight"
  private val other = "completely different content about spark query engines and shuffles here"

  private lazy val docs = Seq(
    (1L, doc), (2L, doc), (3L, nearDoc), (4L, other), (5L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs).collect()
      .map(x => (x.getAs[Long]("n_docs"), x.getAs[Long]("keep_id")))
    assert(r.count(_._1 == 2L) == 1)           // one duplicated text
    assert(r.find(_._1 == 2L).get._2 == 1L)    // canonical = min doc_id
    assert(Dedup.exact(docs).count() == 4)     // 4 distinct texts
  }

  test("minhash LSH finds the exact and near duplicate, not the unrelated pair") {
    val pairs = Dedup.minhashLsh(docs, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 2L)))         // identical
    assert(pairSet.contains((1L, 3L)) || pairSet.contains((2L, 3L))) // near-dup
    assert(!pairSet.exists(p => p._1 == 4L || p._2 == 4L))           // unrelated
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 1.0)  // exact J=1
  }

  test("simhash: identical docs collide at distance 0; near docs within 3") {
    val pairs = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Number]("hamming").longValue))
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) == 0L)
    assert(!m.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("embedding near-dup finds a planted duplicate vector") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val planted = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    val pairs = Dedup.embeddingNearDup(emb.unionByName(planted), threshold = 0.999)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.contains((0L, 100000L)))
  }

  test("shingles: short docs fall back to one whole-doc shingle") {
    val s = docs.filter(col("doc_id") === 5)
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .collect().head.getSeq[String](0)
    assert(s == Seq("short text"))
  }
}
