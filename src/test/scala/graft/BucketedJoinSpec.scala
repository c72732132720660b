package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-partitioning both sides of a recurring join on the key
  * removes the exchange entirely — the co-located-join layout a 100 TB
  * fact/fact join relies on. Verified by plan shape AND result equality. */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    val orders = graft.sources.Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.sources.Tables.load(spark, sf001, "lineitem")
      .select("l_orderkey", "l_quantity")

    def cleanup(): Unit = {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      // a previously aborted run can leave the managed location behind
      // even after DROP; saveAsTable refuses to reuse it
      val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"))
      Seq("b_orders", "b_lineitem").foreach { t =>
        val d = new java.io.File(wh, t)
        if (d.exists()) {
          d.listFiles().foreach(_.delete())
          d.delete()
        }
      }
    }
    cleanup()
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // the fixture tables are small enough to broadcast, which would bypass
    // the bucketed layout entirely — disable it so the plan shows what a
    // fact⨝fact join (where neither side broadcasts) does at scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, joined) = try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("l_quantity")).as("qty"))
      (j.queryExecution.executedPlan.toString, j)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // the join itself needs no exchange: both sides are already
    // hash-distributed on the key by the bucketing layout
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"), plan)
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    // and it computes the same thing as the plain join (evaluated under
    // default settings; results must not depend on the join strategy)
    val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum(col("l_quantity")).as("qty"))
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)

    cleanup()
  }
}
