package graft

import java.nio.file.Files

import graft.operators.IncrementalDedup
import org.scalatest.funsuite.AnyFunSuite

/** Incremental near-dup over the cell-store index: each batch probes only
  * history buckets it collides with, then appends its own state. */
class IncrementalDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("batches find within-batch, cross-batch, and transitive near-dups") {
    val indexDir = Files.createTempDirectory("graft_inc_idx").toString
    val corpusDir = Files.createTempDirectory("graft_inc_doc").toString

    def run(batch: Seq[(Long, String)]) =
      IncrementalDedup.appendBatch(spark, indexDir, corpusDir,
          batch.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // batch 1: an identical pair + an unrelated doc; store is empty so all
    // pairs are within-batch.
    val b1 = run(Seq(
      1L -> (base + " one"),
      2L -> (base + " one"),
      3L -> "completely different words about engines and shuffles again"))
    assert(b1.keySet == Set((1L, 2L)))
    assert(b1((1L, 2L)) == 1.0)

    // batch 2: a near-dup of batch 1's text arrives later — found via the
    // index probe, not a history rescan; unrelated newcomer stays clean.
    val b2 = run(Seq(
      11L -> (base + " two"),
      12L -> "some other topic entirely with fresh vocabulary throughout here"))
    assert(b2.keySet == Set((1L, 11L), (2L, 11L)))
    assert(!b2.keySet.exists { case (a, b) => a == 3L || b == 3L || a == 12L || b == 12L })

    // batch 3: identical to batch 2's doc — transitive chain across three
    // batches, scored 1.0 against its twin.
    val b3 = run(Seq(21L -> (base + " two")))
    assert(b3.contains((11L, 21L)))
    assert(b3((11L, 21L)) == 1.0)
    assert(b3.contains((1L, 21L)) && b3.contains((2L, 21L))) // near-dups too

    // the state stores carry everything ingested so far
    val nDocs = spark.read.format("cellstore").load(corpusDir).count()
    assert(nDocs == 6L)
  }

  test("re-running a batch against populated stores is idempotent on pairs") {
    val indexDir = Files.createTempDirectory("graft_inc_idx2").toString
    val corpusDir = Files.createTempDirectory("graft_inc_doc2").toString
    val b = Seq(1L -> (base + " x"), 2L -> (base + " y"))
    val first = IncrementalDedup.appendBatch(spark, indexDir, corpusDir,
      b.toDF("doc_id", "text")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == Set((1L, 2L)))
    // same docs again (a replayed micro-batch): the pair set toward history
    // is the same pairs plus self-ids excluded — no duplicate-row blowup.
    val replay = IncrementalDedup.appendBatch(spark, indexDir, corpusDir,
      b.toDF("doc_id", "text")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == Set((1L, 2L)))
  }
}
