package graft

import graft.operators.DriftMonitor
import graft.streaming.StreamDrift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming drift: bounded per-band state, each micro-batch scored
  * against the static reference; the cumulative result equals the batch
  * operator over the same rows. */
class StreamDriftSpec extends AnyFunSuite with SparkTestBase {

  test("two micro-batches: drift rises with a skewed tail and matches the batch scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // reference: lengths spread over bands 0..3 evenly
    val reference = (0 until 80).map(i => (i.toLong, (i % 4) * 100 + 50))
      .toDF("doc_id", "n_chars")

    val input = MemoryStream[(Long, Int)]
    val docs = input.toDF().toDF("doc_id", "n_chars")

    val base = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var lastFrame: DataFrame = null
    val q = StreamDrift.start(docs, reference, checkpoint = s"$base/ckpt") {
      (drift, id) =>
        val total = drift.collect().map(_.getAs[Long]("term_micro")).sum
        perBatch.synchronized { perBatch += ((id, total)); lastFrame = drift }
    }
    try {
      // batch 1 mirrors the reference mix — drift ~0
      input.addData((0 until 40).map(i => (1000L + i, (i % 4) * 100 + 50)): _*)
      q.processAllAvailable()
      // batch 2 dumps a heavy band-9 tail — drift must rise
      input.addData((0 until 40).map(i => (2000L + i, 950)): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(perBatch.size == 2)
    val (first, second) = (perBatch(0)._2, perBatch(1)._2)
    assert(first == 0L, s"matching mix must score zero drift, got $first")
    assert(second > 100000L, s"skewed tail must move the score, got $second")

    // stream ≡ batch: the cumulative score equals the batch operator
    // over all streamed rows
    val streamed = ((0 until 40).map(i => (1000L + i, (i % 4) * 100 + 50)) ++
      (0 until 40).map(i => (2000L + i, 950))).toDF("doc_id", "n_chars")
    val batchDrift = DriftMonitor.snapshotDrift(
      streamed.withColumn("band", DriftMonitor.lengthBand(100, 19)),
      reference.withColumn("band", DriftMonitor.lengthBand(100, 19)))
      .collect().map(_.getAs[Long]("term_micro")).sum
    assert(second == batchDrift, s"stream $second vs batch $batchDrift")
  }
}
