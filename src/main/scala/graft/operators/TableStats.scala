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
    // One PRUNED pass per column, unioned — a multi-column agg mixing
    // several countDistincts forces an Expand + SortAggregate cascade
    // (measured 60x slower at sf0.1). Within a column, the pass is
    // DEDUP-FIRST (round 18): aggregate to (value, count) once — map-side
    // combined, the same first level Spark's distinct rewrite would build
    // anyway — then take EVERY statistic from the distinct table: n_rows
    // = Σ count, nulls from the null group's count, ndv/min/max over the
    // keys, and the HLL sketch over the keys (registers are max-folded,
    // so the sketch of the distinct set is bit-identical to the sketch of
    // the multiset). That retires both former hazards at once: no second
    // full-table pass for the sketch, and no ~16 KB HLL buffer per
    // DISTINCT VALUE (the rsd=0.01 buffer rides the ONE global group) —
    // the trap that cost 6 s on a 150k-distinct key when the sketch
    // shared an agg with countDistinct. No crossJoin assembly either:
    // 2 scans + 4 exchanges per column before, 1 scan + 2 exchanges now.
    columns.map { c =>
      df.groupBy(col(c).as("_v")).agg(count(lit(1)).as("_c"))
        .agg(
          // coalesce: sum over ZERO groups is NULL, and an empty table
          // must report n_rows = 0 / n_nulls = 0 like the pre-dedup-first
          // count(...) form did (round-18 advice)
          coalesce(sum(col("_c")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("_v").isNotNull, col("_c")).otherwise(0L)),
            lit(0L)).as("_cnt"),
          count(col("_v")).as("ndv"),
          min(col("_v")).cast("string").as("min_value"),
          max(col("_v")).cast("string").as("max_value"),
          // DataSketches HLL (round 19) instead of approx_count_distinct:
          // HLL++ at rsd=0.01 carries its 2^14 registers as ~2,731 agg
          // BUFFER ATTRIBUTES, which costs ~0.9 s of planning/codegen per
          // execution REGARDLESS of row count (measured: 1 000-row input,
          // same cost); the DataSketches sketch is ONE binary buffer.
          // lgK=14 has ~0.8% relative standard error, so the 5% bound
          // below keeps >6 sigma of headroom — the emitted boolean cannot
          // flip. xxhash64 canonicalizes any column type to a long
          // (sketch input only; a 64-bit collision can only nudge the
          // estimate by ~1), and the when() keeps nulls out of the
          // sketch exactly like approx_count_distinct ignored them.
          hll_sketch_estimate(hll_sketch_agg(
            when(col("_v").isNotNull, xxhash64(col("_v"))), lit(14)))
            .as("_andv"))
        .select(
          lit(c).as("col_name"),
          col("n_rows"),
          (col("n_rows") - col("_cnt")).as("n_nulls"),
          col("ndv"),
          (abs(col("_andv") - col("ndv")).cast("double") <=
            lit(0.05) * col("ndv").cast("double")).as("ndv_within_bound"),
          col("min_value"), col("max_value"))
    }.reduce(_.unionByName(_))
  }

  /** Query-pack adapter: stats over four engine-portable orders columns. */
  def tableStatsQuery(spark: SparkSession, sfDir: String): DataFrame =
    analyze(Tables.load(spark, sfDir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"))

  /**
   * The textbook equi-join cardinality estimate from column statistics —
   * |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B) — next to the ACTUAL join
   * count, with a 3x accuracy gate. This is what the collected stats are
   * FOR: sizing a join (broadcast or not, how many shuffle partitions)
   * before paying for it. All-integer arithmetic end to end, so the
   * oracle recomputes every column including the boolean exactly.
   */
  def joinEstimate(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val ls = left.agg(count(lit(1)).as("n_left"),
      countDistinct(col(leftKey)).as("ndv_left"))
    val rs = right.agg(count(lit(1)).as("n_right"),
      countDistinct(col(rightKey)).as("ndv_right"))
    val actual = left.join(right, col(leftKey) === col(rightKey))
      .agg(count(lit(1)).as("actual_rows"))
    // integer `div` (not `/`, which is double division in Spark SQL) so
    // every emitted value is exact integer arithmetic on both engines
    ls.crossJoin(rs).crossJoin(actual)
      .withColumn("est_rows",
        expr("(n_left * n_right) div greatest(ndv_left, ndv_right)"))
      .select(col("n_left"), col("n_right"), col("ndv_left"), col("ndv_right"),
        col("est_rows"), col("actual_rows"),
        (col("est_rows") <= col("actual_rows") * 3 &&
          col("est_rows") * 3 >= col("actual_rows")).as("within_3x"))
  }

  /** Query-pack adapter: estimate vs actual for orders ⋈ customer. */
  def joinEstimateQuery(spark: SparkSession, sfDir: String): DataFrame =
    joinEstimate(Tables.load(spark, sfDir, "orders"),
      Tables.load(spark, sfDir, "customer"), "o_custkey", "c_custkey")
}
