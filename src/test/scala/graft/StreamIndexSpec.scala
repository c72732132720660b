package graft

import graft.operators.InvertedIndex
import graft.streaming.StreamIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index freshness under ingest: streamed per-batch index deltas must
  * rank EXACTLY like a from-scratch index of the full corpus, replays
  * cannot double-count, and compaction folds the stores without ever
  * re-reading the documents. */
class StreamIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("streamed index deltas rank exactly like a full rebuild; replay + compact are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamidx").toString
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def slice(kk: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === kk)
    val terms = Seq("merge", "sort", "window")

    // reference: one index over the whole corpus
    val fullDir = s"$base/full"
    InvertedIndex.buildIndex(spark, docs, fullDir, buckets = 4)
    def ranking(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("rank"))).toSeq
    val expected = ranking(InvertedIndex.search(spark, fullDir, terms, 20))

    val root = s"$base/idx"
    StreamIndex.initialize(spark, slice(0), root, buckets = 4)
    val input = MemoryStream[(Long, String)]
    val q = StreamIndex.start(
      input.toDF().toDF("doc_id", "text"), root,
      checkpoint = s"$base/ckpt", buckets = 4)
    def rows(kk: Int) = slice(kk).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    try {
      input.addData(rows(1): _*); q.processAllAvailable()
      input.addData(rows(2): _*); q.processAllAvailable()
    } finally q.stop()

    def got() = ranking(StreamIndex.searchAll(spark, root, terms, 20))
    assert(got() == expected, "delta-union ranking must equal full rebuild")

    // at-least-once replay: the batch overwrites its own delta store
    StreamIndex.appendBatch(slice(2), batchId = 1L, root, buckets = 4)
    assert(got() == expected)

    // compaction merges the stores from their own artifacts and commits
    // atomically as the next base generation (folded through batch 1)
    StreamIndex.compact(spark, root, buckets = 4)
    assert(got() == expected, "compaction must not change the ranking")
    def deltaNames() = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("delta="))
      .map(_.getName).toSeq.sorted
    assert(deltaNames() == Seq("delta=base@1"))

    // crash replay: a pass that staged + renamed but died BEFORE the GC
    // sweep leaves the pre-fold dirs behind — readers must ignore them
    // (no double count) and the next compact must sweep them
    StreamIndex.appendBatch(slice(1), batchId = 0L, root, buckets = 4)
    StreamIndex.appendBatch(slice(2), batchId = 1L, root, buckets = 4)
    assert(got() == expected,
      "slices at or below the base generation's folded id must be ignored")
    StreamIndex.compact(spark, root, buckets = 4) // nothing new to fold: GC only
    assert(deltaNames() == Seq("delta=base@1"), "GC must sweep stale slices")
    assert(got() == expected)
  }
}
