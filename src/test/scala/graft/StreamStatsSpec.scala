package graft

import graft.streaming.StreamStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ANALYZE: per-batch sketch deltas merge to corpus-true
  * statistics without rescanning history; replays cannot double-count. */
class StreamStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("two overlapping batches merge to true counts and ~true ndv; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft-streamstats").toString
    val statsDir = s"$base/stats"
    def batchOf(r: Range) = r.map(i => (i.toLong, s"cat${i % 5}"))

    val q = StreamStats.start(
      input.toDF().toDF("id", "category"), Seq("id", "category"),
      statsDir, checkpoint = s"$base/ckpt")
    try {
      input.addData(batchOf(0 until 100): _*); q.processAllAvailable()
      // overlapping id range: distinct-union must NOT double-count 50..99
      input.addData(batchOf(50 until 150): _*); q.processAllAvailable()
    } finally q.stop()

    def snapshot() = StreamStats.merged(spark, statsDir).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Long]("ndv_approx")))).toMap
    val m = snapshot()
    assert(m("id")._1 == 200L && m("id")._2 == 0L)
    // true distinct ids = 150; lgK=12 sketch is well within 5% here
    assert(math.abs(m("id")._3 - 150L) <= 8L, s"ndv off: ${m("id")._3}")
    assert(m("category")._3 == 5L)

    // at-least-once replay of batch 1: overwrite-by-batch-id keeps the
    // merged view identical
    StreamStats.appendBatch(
      batchOf(50 until 150).toDF("id", "category"), Seq("id", "category"),
      statsDir, batchId = 1L)
    assert(snapshot() == m)

    // the merged view reads ONLY the delta table: batches x columns rows
    assert(spark.read.parquet(statsDir).count() == 4L)
  }
}
