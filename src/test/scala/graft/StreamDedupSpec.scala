package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup: first occurrence survives, duplicates within the
  * watermark horizon are dropped — including across micro-batches. */
class StreamDedupSpec extends AnyFunSuite with SparkTestBase {

  test("one survivor per digest, within and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val q = StreamDedup.exactDedupStream(input.toDF().toDF("ts", "text"))
      .select("ts", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      // batch 1: in-batch duplicate of "alpha"
      input.addData((ts(10, 0), "alpha"), (ts(10, 5), "alpha"), (ts(10, 10), "beta"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate (still within the 1h horizon) + new doc
      input.addData((ts(10, 15), "alpha"), (ts(10, 20), "gamma"))
      q.processAllAvailable()
    } finally q.stop()

    val texts = spark.table("dedup_stream").select("text").collect().map(_.getString(0))
    assert(texts.sorted.toSeq == Seq("alpha", "beta", "gamma"))
  }
}
