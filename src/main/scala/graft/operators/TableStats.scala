package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * ANALYZE-style per-column table statistics — the inputs a cost-based
 * planner (or a human sizing a join) actually needs: row count, null
 * count, distinct count, min/max. One pass over the table; the distinct
 * counts come from HLL sketches (fixed-size, map-side combined,
 * mergeable), with the exact `countDistinct` twin alongside as the
 * driver-verified bound — the [[Sketches.vocabApproxCheckQuery]]
 * pattern: at 100 TB only the sketch side runs.
 *
 * min/max are rendered as strings so one schema fits every column type;
 * the query-pack adapter sticks to types whose string rendering is
 * engine-portable (integers, strings, dates, fixed-scale decimals).
 */
object TableStats {

  def analyze(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty)
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        approx_count_distinct(col(c), 0.01).as(s"andv_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(columns.map { c =>
        struct(
          lit(c).as("col_name"),
          col("n_rows"),
          (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
          col(s"ndv_$c").as("ndv"),
          (abs(col(s"andv_$c") - col(s"ndv_$c")).cast("double") <=
            lit(0.05) * col(s"ndv_$c").cast("double")).as("ndv_within_bound"),
          col(s"min_$c").as("min_value"),
          col(s"max_$c").as("max_value"))
      }: _*)).as("s"))
      .select("s.*")
  }

  /** Query-pack adapter: stats over four engine-portable orders columns. */
  def tableStatsQuery(spark: SparkSession, sfDir: String): DataFrame =
    analyze(Tables.load(spark, sfDir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"))
}
