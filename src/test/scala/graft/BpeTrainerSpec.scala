package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("BPE: learns the hand-computed merge sequence on the classic corpus") {
    // Sennrich's running example, shrunk: counts are
    //   low ×3, lower ×1, lowest ×1
    // pair counts round 1: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    //   → tie (l,o)/(o,w) broken lexicographically: merge (l,o)
    // round 2: (lo,w)=5 dominates → (lo,w)
    // round 3: (low,e)=2 → (low,e)
    // round 4: all remaining pairs count 1; lexicographic order picks
    //   (lowe,r) first ('lowe' < 's')
    val docs = Seq((1L, "low low lower"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val (merges, words) = BpeTrainer.trainMerges(docs, numMerges = 4)
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.count)) == Seq(
      (1, "l", "o", 5L),
      (2, "lo", "w", 5L),
      (3, "low", "e", 2L),
      (4, "lowe", "r", 1L)))
    // the final word table carries the merged symbols
    val syms = words.select(col("syms")).collect()
      .map(_.getSeq[String](0).mkString("|")).toSet
    assert(syms == Set("low", "lower", "lowe|s|t"))
  }

  test("BPE: greedy leftmost application — 'aaa' under (a,a) becomes [aa, a]") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val (merges, words) = BpeTrainer.trainMerges(docs, numMerges = 1)
    assert(merges.head.lhs == "a" && merges.head.rhs == "a")
    // per-position counting: "aaa" has TWO (a,a) adjacencies × 2 words
    assert(merges.head.count == 4L)
    val syms = words.select(col("syms")).head.getSeq[String](0)
    assert(syms == Seq("aa", "a"))
  }

  test("BPE: exhausts gracefully when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val (merges, _) = BpeTrainer.trainMerges(docs, numMerges = 5)
    assert(merges.isEmpty, "single-char words have no adjacent pairs")
  }

  test("BPE encode: subword vocabulary counts are frequency-consistent") {
    val r = BpeTrainer.bpeEncodeQuery(spark, sf001).collect()
    assert(r.nonEmpty)
    // every subword position count is positive and weighted counts are
    // at least the position counts (word frequencies >= 1)
    assert(r.forall(x => x.getAs[Long]("n_positions") >= 1 &&
      x.getAs[Long]("total_count") >= x.getAs[Long]("n_positions")))
    // at least one multi-character symbol exists after 6 merges
    assert(r.exists(_.getAs[String]("symbol").length > 1))
  }

  test("BPE: merge decisions are partitioning-stable") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val (a, _) = BpeTrainer.trainMerges(docs, numMerges = 3)
    val (b, _) = BpeTrainer.trainMerges(docs.repartition(13), numMerges = 3)
    assert(a == b, s"$a vs $b")
    assert(a.length == 3)
  }
}
