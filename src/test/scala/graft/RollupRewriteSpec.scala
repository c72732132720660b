package graft

import graft.operators.MaterializedRollup
import graft.plans.RollupRewrite
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** The materialized-rollup optimizer rule: the rewrite must fire for
  * answerable aggregates (scan the rollup, not the fact table), must
  * NOT fire when semantics could change, and must return bit-identical
  * results either way. */
class RollupRewriteSpec extends AnyFunSuite with SparkTestBase {

  private val Dec = DecimalType(18, 4)

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def rollupPath: String = MaterializedRollup.ensure(spark, sf001)

  private def li = Tables.load(spark, sf001, "lineitem")

  // optimizedPlan.toString prints relations without their location, so
  // the rewrite is asserted via the rollup's partial columns (present
  // only in the materialized table) vs base fact columns.
  private def servedBy(plan: String): Boolean =
    plan.contains("sum_qty_p") && !plan.contains("l_orderkey")

  test("rewrite fires: coarser regroup scans the rollup, not lineitem") {
    rollupPath
    val p = optimized(MaterializedRollup.rollupServedQuery(spark, sf001))
    assert(servedBy(p), s"expected rollup scan in:\n$p")
    assert(!p.contains("l_quantity"), s"fact table must not be scanned:\n$p")
  }

  test("served result equals the unrewritten aggregation, schema included") {
    val served = MaterializedRollup.rollupServedQuery(spark, sf001)
    val direct = {
      spark.conf.set("spark.graft.rollup.enabled", "false")
      try MaterializedRollup.servedAggregate(spark, sf001).collect()
      finally spark.conf.set("spark.graft.rollup.enabled", "true")
    }
    assert(served.schema == MaterializedRollup.servedAggregate(spark, sf001).schema)
    val got = served.collect().map(_.toSeq).toSet
    assert(got == direct.map(_.toSeq).toSet)
    assert(got.nonEmpty)
  }

  test("exact-key regroup is also served") {
    rollupPath
    val q = li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"))
    assert(optimized(q).contains("cnt_p"))
    val direct = li.groupBy("l_returnflag", "l_linestatus").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    q.collect().foreach { r =>
      assert(r.getLong(2) == direct((r.getString(0), r.getString(1))))
    }
  }

  test("no rewrite: unregistered measure, filter, distinct, foreign keys") {
    rollupPath
    val unregistered = li.groupBy("l_returnflag")
      .agg(sum(col("l_tax").cast(Dec)).as("s"))
    assert(!optimized(unregistered).contains("cnt_p"))
    val filtered = li.filter(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(!optimized(filtered).contains("cnt_p"))
    val distinctAgg = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_linestatus")).as("n"))
    assert(!optimized(distinctAgg).contains("cnt_p"))
    val wrongKey = li.groupBy("l_suppkey").agg(count(lit(1)).as("n"))
    assert(!optimized(wrongKey).contains("cnt_p"))
  }

  test("key-only filter is served; answers equal the unrewritten plan bit-exactly") {
    rollupPath
    def q = li.filter(col("l_linestatus") === "F" && col("l_returnflag") =!= "A")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(Dec)).as("s"), count(lit(1)).as("n"))
    val p = optimized(q)
    assert(servedBy(p), s"key-only filter must still be served:\n$p")
    spark.conf.set("spark.graft.rollup.enabled", "false")
    val expected = try q.collect().map(r =>
      (r.getString(0), r.getDecimal(1), r.getLong(2))).sortBy(_._1).toSeq
    finally spark.conf.set("spark.graft.rollup.enabled", "true")
    val got = q.collect().map(r =>
      (r.getString(0), r.getDecimal(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("no rewrite: a filter touching a non-key column") {
    rollupPath
    val nonKey = li.filter(col("l_quantity") > 0)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(!optimized(nonKey).contains("cnt_p"))
    val mixed = li.filter(col("l_returnflag") === "R" && col("l_tax") > 0)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(!optimized(mixed).contains("cnt_p"))
  }

  test("no rewrite: a multi-path scan over base + another path keeps every path's rows") {
    rollupPath
    val extra = java.nio.file.Files.createTempDirectory("graft-rollup-extra").toString
    li.limit(7).write.mode("overwrite").parquet(extra)
    val multi = spark.read.parquet(s"$sf001/lineitem.parquet", extra)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(!optimized(multi).contains("cnt_p"),
      "a scan whose root paths are a superset of the rollup's base must not be served")
    assert(multi.agg(sum(col("n"))).head.getLong(0) == li.count() + 7,
      "the extra path's rows must survive in the answer")
  }

  test("global aggregate (no grouping) is served and counts exactly") {
    rollupPath
    val q = li.agg(count(lit(1)).as("n"))
    assert(optimized(q).contains("cnt_p"))
    assert(q.head.getLong(0) == li.count())
  }

  test("kill switch: spark.graft.rollup.enabled=false leaves the plan alone") {
    rollupPath
    spark.conf.set("spark.graft.rollup.enabled", "false")
    try {
      val p = optimized(MaterializedRollup.servedAggregate(spark, sf001))
      assert(!p.contains("sum_qty_p"))
      assert(p.contains("l_quantity"))
    } finally spark.conf.set("spark.graft.rollup.enabled", "true")
  }

  test("rewritten output composes: downstream filter/sort bind by exprId") {
    rollupPath
    val df = MaterializedRollup.servedAggregate(spark, sf001)
      .filter(col("n_rows") > 0)
      .orderBy(col("l_returnflag"))
    assert(servedBy(optimized(df)))
    val flags = df.collect().map(_.getString(0)).toSeq
    assert(flags == flags.sorted && flags.nonEmpty)
  }
}
