package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Region balance management — the HBase RegionSplitter / balancer
 * analogue: compute exact, row-atomic split points over a cell
 * population, report per-region skew from footers, and re-region a store
 * in place.
 *
 * [[splitPoints]] is EXACT (rank-based, not sampled) yet never sorts the
 * data on one node: per-key cell counts are range-partitioned, each
 * partition computes a local running sum, and the per-partition totals —
 * one row per shuffle partition, scale-bounded — turn into prefix
 * offsets with a tiny window, broadcast back. The global cumulative
 * position of every key is local sum + partition offset; key k owns
 * split i exactly when rank_i = ⌈i·R/n⌉ falls in (cum(k)−count(k),
 * cum(k)] — evaluated per row with integer arithmetic, so a hot key
 * spanning several ranks owns several splits (rows stay atomic: HBase
 * never splits a row across regions). Totals, offsets, and the grand
 * total live in ONE job: both consumers of the range exchange share it
 * via ReusedExchange, so the sampler runs once and the offsets can never
 * disagree with the partitioning they describe.
 */
object StoreRebalance {

  /** (split_idx ∈ [1, n−1], split_key): split_key is the last row key
    * (inclusive) of region `split_idx − 1` under an n-way balanced-by-
    * cell-count split. `cells` needs only a `rowKey` column. */
  def splitPoints(cells: DataFrame, n: Int): DataFrame = {
    require(n >= 2, "need at least 2 regions to have a split")
    val kc = cells.groupBy("rowKey").agg(count(lit(1)).as("nc"))
    val parts = kc.repartitionByRange(col("rowKey"))
      .sortWithinPartitions("rowKey")
      .withColumn("pid", spark_partition_id())
    val ptot = parts.groupBy("pid").agg(sum(col("nc")).as("t"))
    val wPrefix = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ptot.select(col("pid"),
      coalesce(sum(col("t")).over(wPrefix), lit(0L)).as("off"))
    val grand = ptot.agg(sum(col("t")).as("r"))
    val wLocal = Window.partitionBy("pid").orderBy("rowKey")
    val cum = parts
      .withColumn("cum", sum(col("nc")).over(wLocal))
      .join(broadcast(offsets), "pid")
      .crossJoin(broadcast(grand))
      .withColumn("cum", col("cum") + col("off"))
      .withColumn("prev", col("cum") - col("nc"))
    // i owns this key iff prev·n/R < i ≤ cum·n/R (integer div keeps the
    // ceil boundary exact; doubles would mis-floor near 2^53)
    val start = expr(s"(prev * $n) div r") + lit(1L)
    val end = least(expr(s"(cum * $n) div r"), lit((n - 1).toLong))
    cum.select(
        explode(when(start <= end, sequence(start, end))
          .otherwise(array().cast("array<bigint>"))).as("split_idx"),
        col("rowKey").as("split_key"))
  }

  /** Footer-only balance report: one row — file count plus min/mean/max
    * region row counts and the max/mean skew ratio (the "does this store
    * need a rebalance?" answer, no data pages read). */
  def skewReport(spark: SparkSession, path: String): DataFrame =
    StoreStats.describe(spark, path).agg(
      count(lit(1)).cast("bigint").as("n_files"),
      min(col("rows")).as("min_rows"),
      round(avg(col("rows")), 2).as("mean_rows"),
      max(col("rows")).as("max_rows"),
      round(max(col("rows")) / avg(col("rows")), 4).as("skew"))

  /** Re-region a range store in place to `numRegions` balanced regions —
    * a pure re-layout: every cell version survives ([[Compaction]] is the
    * one that drops data). The writer's ordered-distribution requirement
    * re-derives the region boundaries from the data. */
  def rebalance(spark: SparkSession, path: String, numRegions: Int): Unit =
    spark.read.format("cellstore").load(path)
      .write.format("cellstore").mode("overwrite")
      .option("numRegions", numRegions.toString)
      .save(path)
}
