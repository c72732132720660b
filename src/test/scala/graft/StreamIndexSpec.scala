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

  test("compact aborts loudly on a slice landing after its snapshot; nothing folded, nothing GC'd") {
    import graft.streaming.DeltaLayout
    val base = java.nio.file.Files.createTempDirectory("graft-sidx-race").toString
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def slice(kk: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === kk)
    val terms = Seq("merge", "sort", "window")
    val root = s"$base/idx"
    StreamIndex.initialize(spark, slice(0), root, buckets = 4)
    StreamIndex.appendBatch(slice(1), batchId = 1L, root, buckets = 4)

    // the fold fixes its input HERE; a slice lands during the merge —
    // the interleaving that used to be swept silently by gcStale under
    // the single-writer-by-contract note, now enforced loudly
    val snapshot = DeltaLayout.liveDirs(spark, root)
    StreamIndex.appendBatch(slice(2), batchId = 2L, root, buckets = 4)
    val e = intercept[IllegalStateException](
      StreamIndex.compactFrom(spark, root, snapshot, buckets = 4))
    assert(e.getMessage.contains("index compact raced a concurrent writer"))

    // live set untouched: every slice still present, ranking still equals
    // a from-scratch index of the full corpus
    def deltaNames() = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("delta="))
      .map(_.getName).toSeq.sorted
    assert(deltaNames() == Seq("delta=b1", "delta=b2", "delta=base"))
    val fullDir = s"$base/full"
    InvertedIndex.buildIndex(spark, docs, fullDir, buckets = 4)
    def ranking(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("rank"))).toSeq
    assert(ranking(StreamIndex.searchAll(spark, root, terms, 20)) ==
      ranking(InvertedIndex.search(spark, fullDir, terms, 20)))

    // writer quiesced: the next compact folds everything
    StreamIndex.compact(spark, root, buckets = 4)
    assert(deltaNames() == Seq("delta=base@2"))
    assert(ranking(StreamIndex.searchAll(spark, root, terms, 20)) ==
      ranking(InvertedIndex.search(spark, fullDir, terms, 20)))
  }

  test("post-commit guard: a slice the fold claims but never read is quarantined, loudly, and survives later compacts") {
    import graft.streaming.DeltaLayout
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-refusegc").toString
    Seq((1L, 1L)).toDF("k", "v").write.parquet(s"$root/delta=b0")
    Seq((2L, 1L)).toDF("k", "v").write.parquet(s"$root/delta=b1")
    val snap = DeltaLayout.liveDirs(spark, root)
    // a fold through gen=1 whose snapshot HAD b1: both slices claimed and
    // read — no refusal
    DeltaLayout.refuseGcOnConcurrent(spark, root, snap, 1L, "compact", "h")
    // gen=0 with b1 outside the claim (id 1 > 0): b1 stays live — no refusal
    DeltaLayout.refuseGcOnConcurrent(spark, root,
      snap.filterNot(_.contains("delta=b1")), 0L, "compact", "h")
    assert(DeltaLayout.quarantined(spark, root).isEmpty)
    // a fold claiming gen=1 that never READ b1 (landed in the commit
    // window): loud, and the slice is QUARANTINED — renamed to a name no
    // liveness or GC rule parses, so the evidence outlives later cycles
    val e = intercept[IllegalStateException](
      DeltaLayout.refuseGcOnConcurrent(spark, root,
        snap.filterNot(_.contains("delta=b1")), 1L, "compact", "h"))
    assert(e.getMessage.contains("NOT in the new base"))
    assert(e.getMessage.contains("quarantined as delta=b1.quarantined"))
    assert(!new java.io.File(s"$root/delta=b1").exists())
    assert(new java.io.File(s"$root/delta=b1.quarantined").exists())
    assert(DeltaLayout.quarantined(spark, root)
      .map(d => new java.io.File(d).getName) == Seq("delta=b1.quarantined"))

    // THE round-18 pin: before the quarantine, the refused slice's id was
    // ≤ the committed generation, so the NEXT routine compact's gcStale
    // swept it silently — the only copy of the un-folded rows survived
    // exactly one cycle. Simulate that next cycle (commit base@1, then a
    // routine fold pass with nothing to fold → gcStale-only): the
    // quarantined slice must STILL be on disk and still reported.
    Seq((9L, 9L)).toDF("k", "v").write.parquet(s"$root/${DeltaLayout.Staging}")
    DeltaLayout.commitFold(spark, root, 1L)
    DeltaLayout.compactConcat(spark, root) // no live batches: GC-only pass
    assert(new java.io.File(s"$root/delta=b1.quarantined").exists(),
      "a routine compact after the refusal must not sweep the quarantine")
    assert(DeltaLayout.quarantined(spark, root)
      .map(d => new java.io.File(d).getName) == Seq("delta=b1.quarantined"))
    // the quarantined rows are intact and readable for re-ingest
    assert(spark.read.parquet(s"$root/delta=b1.quarantined")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 1L)))
    // and the live read path never sees the quarantine
    assert(DeltaLayout.liveDirs(spark, root)
      .map(d => new java.io.File(d).getName) == Seq("delta=base@1"))
  }
}
