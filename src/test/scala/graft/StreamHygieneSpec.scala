package graft

import graft.operators.CorpusPipeline
import graft.streaming.StreamHygiene
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming hygiene: narrow gates run on the stream, decontamination per
  * micro-batch; output matches the batch pipeline on the same data. */
class StreamHygieneSpec extends AnyFunSuite with SparkTestBase {

  test("gates + decontamination over two micro-batches match the batch operators") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val good = "a sober paragraph of reasonable length, with punctuation, " +
      "clauses that carry on, and vocabulary that does not repeat itself " +
      "unduly across the span of the text it inhabits."
    val leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val evalSet = Seq((100L, leaked)).toDF("doc_id", "text")

    val input = MemoryStream[(Long, String, String, String)]
    val docs = input.toDF().toDF("doc_id", "text", "lang", "source")

    val base = java.nio.file.Files.createTempDirectory("graft_hyg").toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamHygiene.start(docs, evalSet,
      CorpusPipeline.Config(), checkpoint = s"$base/ckpt") { (batch, _) =>
      out.synchronized { out ++= batch.select("doc_id").collect() }
    }
    try {
      input.addData(
        (1L, good, "en", "s0"),
        (2L, "x", "en", "s0"),              // quality gate
        (3L, good + " more", "xx", "s0"))   // language gate
      q.processAllAvailable()
      input.addData(
        (11L, good + " again", "en", "s1"),
        (12L, leaked + " with a tail of extra words", "en", "s1")) // leaked
      q.processAllAvailable()
    } finally q.stop()

    val ids = out.map(_.getLong(0)).toSet
    assert(ids == Set(1L, 11L), s"expected only clean en docs, got $ids")
  }
}
