package graft

import graft.model.CellTable
import graft.operators.InvertedIndex
import org.scalatest.funsuite.AnyFunSuite

/** Purge propagation to the derived search artifact: tombstones +
  * corrected df/meta cells must make every search path rank exactly as
  * an index REBUILT without the purged documents. */
class IndexPurgeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "sort merge window sort"),
    (2L, "merge window merge merge"),
    (3L, "sort merge unique window"),
    (4L, "window sort sort merge"),
    (5L, "merge sort"))
    .toDF("doc_id", "text")

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"purge_$name").toString
    new java.io.File(d).delete(); d
  }

  private def ranking(dir: String, terms: Seq[String]) =
    InvertedIndex.searchBm25(spark, dir, terms, k = 10, lnIdf = false)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("rank"))).toSeq

  test("purged index ranks exactly as a rebuild without the purged docs") {
    val purged = tmp("a"); val rebuilt = tmp("b")
    InvertedIndex.buildIndex(spark, corpus, purged)
    InvertedIndex.purgeIndex(spark, purged, corpus.filter($"doc_id" isin (2L, 3L)))
    InvertedIndex.buildIndex(spark, corpus.filter(!($"doc_id" isin (2L, 3L))), rebuilt)
    val terms = Seq("merge", "sort", "window")
    assert(ranking(purged, terms) == ranking(rebuilt, terms))
    // tf-idf and phrase search see the purge too
    assert(InvertedIndex.search(spark, purged, terms, 10).collect().toSeq ==
      InvertedIndex.search(spark, rebuilt, terms, 10).collect().toSeq)
    assert(
      InvertedIndex.searchPhrase(spark, purged, Seq("sort", "merge"), 10)
        .collect().toSeq ==
      InvertedIndex.searchPhrase(spark, rebuilt, Seq("sort", "merge"), 10)
        .collect().toSeq)
  }

  test("a term whose last posting dies disappears; re-purge is a no-op") {
    val dir = tmp("c")
    InvertedIndex.buildIndex(spark, corpus, dir)
    // 'unique' only occurs in doc 3
    InvertedIndex.purgeIndex(spark, dir, corpus.filter($"doc_id" === 3L))
    assert(InvertedIndex.search(spark, dir, Seq("unique"), 10).collect().isEmpty)
    val before = ranking(dir, Seq("merge", "sort", "window"))
    // same subject again at a later ts: victims are already masked, so
    // df/meta must not double-decrement
    InvertedIndex.purgeIndex(spark, dir, corpus.filter($"doc_id" === 3L),
      purgeTs = CellTable.BaseTs + 2)
    assert(ranking(dir, Seq("merge", "sort", "window")) == before)
  }

  test("major compaction folds the purge away and restores the fast path") {
    val dir = tmp("e"); val rebuilt = tmp("f")
    InvertedIndex.buildIndex(spark, corpus, dir)
    InvertedIndex.purgeIndex(spark, dir, corpus.filter($"doc_id" isin (2L, 3L)))
    InvertedIndex.compactIndex(spark, dir)
    InvertedIndex.buildIndex(spark, corpus.filter(!($"doc_id" isin (2L, 3L))), rebuilt)
    // ranking identical to a rebuild, through every search path
    val terms = Seq("merge", "sort", "window")
    assert(ranking(dir, terms) == ranking(rebuilt, terms))
    assert(
      InvertedIndex.searchPhrase(spark, dir, Seq("sort", "merge"), 10)
        .collect().toSeq ==
      InvertedIndex.searchPhrase(spark, rebuilt, Seq("sort", "merge"), 10)
        .collect().toSeq)
    // the store is physically pristine again: no markers, no tombstoned
    // flag, one surviving version per coordinate
    val cells = spark.read.format("cellstore").load(dir)
    assert(cells.filter($"cellType" === "Delete").isEmpty)
    assert(cells.filter($"family" === "meta" &&
      $"qualifier".cast("string") === "tombstoned").isEmpty)
    import org.apache.spark.sql.functions.{count => cnt, lit}
    assert(cells.groupBy($"rowKey", $"family", $"qualifier")
      .agg(cnt(lit(1)).as("n")).filter($"n" > 1).isEmpty)
  }

  test("non-purged postings and an untouched store are unaffected") {
    val dir = tmp("d")
    InvertedIndex.buildIndex(spark, corpus, dir)
    val before = ranking(dir, Seq("merge", "sort", "window"))
    InvertedIndex.purgeIndex(spark, dir, corpus.filter($"doc_id" === 999L))
    assert(ranking(dir, Seq("merge", "sort", "window")) == before,
      "purging an absent subject changes nothing")
  }
}
