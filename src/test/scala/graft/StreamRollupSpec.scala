package graft

import graft.plans.RollupRewrite
import graft.streaming.StreamRollup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Rollup freshness under ingest: streamed per-batch partial deltas
  * keep the REWRITTEN base-table aggregation equal to a fact rescan,
  * replays cannot double-count, and the serving scan reads only the
  * compact delta slices. */
class StreamRollupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val Dec = DecimalType(18, 4)

  test("streamed deltas keep the served aggregation exact; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-streamroll").toString
    // isolated fact table (registering the shared fixture path would
    // leak a partially-loaded rollup into concurrently running suites)
    val factDir = s"$base/fact"
    graft.sources.Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.parquet(factDir)
    val fact = spark.read.parquet(factDir)
    def slice(k: Int) = fact.filter(pmod(col("o_orderkey"), lit(3)) === k)

    val r = StreamRollup.initialize(
      slice(0),
      keys = Seq("o_orderstatus"),
      sums = Map(("o_totalprice", Some(Dec): Option[org.apache.spark.sql.types.DataType]) -> "sum_tp_p"),
      count = Some("cnt_p"),
      root = s"$base/rollup")
    try {
      val input = MemoryStream[(Long, String, Double)]
      val q = StreamRollup.start(
        input.toDF().toDF("o_orderkey", "o_orderstatus", "o_totalprice"),
        r, checkpoint = s"$base/ckpt")
      def rows(k: Int) = slice(k).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
      try {
        input.addData(rows(1): _*); q.processAllAvailable()
        input.addData(rows(2): _*); q.processAllAvailable()
      } finally q.stop()

      val served = fact.groupBy("o_orderstatus").agg(
        sum(col("o_totalprice").cast(Dec)).cast("double").as("tp"),
        count(lit(1)).as("n"))
      val plan = served.queryExecution.optimizedPlan.toString
      assert(plan.contains("sum_tp_p"), s"rewrite must fire:\n$plan")
      def result() = served.collect()
        .map(x => x.getString(0) -> ((x.getDouble(1), x.getLong(2)))).toMap
      val got = result()
      val direct = {
        spark.conf.set("spark.graft.rollup.enabled", "false")
        try fact.groupBy("o_orderstatus").agg(
          sum(col("o_totalprice").cast(Dec)).cast("double").as("tp"),
          count(lit(1)).as("n")).collect()
          .map(x => x.getString(0) -> ((x.getDouble(1), x.getLong(2)))).toMap
        finally spark.conf.set("spark.graft.rollup.enabled", "true")
      }
      assert(got == direct, s"served $got != fact rescan $direct")
      assert(got.values.map(_._2).sum == fact.count())

      // at-least-once replay of the second batch: its delta slice is
      // overwritten in place, the served answer cannot double-count
      StreamRollup.appendBatch(slice(2), batchId = 1L, r)
      assert(result() == got)

      // serving reads ONLY the compact slices: 3 deltas x |statuses|
      val nStatuses = direct.size.toLong
      assert(spark.read.parquet(r.rollupPath).count() == 3L * nStatuses)

      // compaction folds the deltas back to one slice, same answers
      StreamRollup.compact(spark, r)
      assert(result() == got, "compaction must not change served results")
      assert(spark.read.parquet(r.rollupPath).count() == nStatuses)
    } finally RollupRewrite.unregister(r.basePaths)
  }
}
