package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Distribution statistics: exact forms (oracle-checked) next to the sketch
 * forms that replace them at 100 TB.
 *
 *  - Exact percentiles sort-and-interpolate within each group — fine at
 *    bench scale, a full sort of the group at 100 TB.
 *  - `approx_percentile` (KLL-style) and `approx_count_distinct` (HLL++)
 *    are one-pass, fixed-memory, mergeable map-side sketches — the shape
 *    that survives a 1000-executor aggregation. Their outputs are
 *    engine-specific, so they are covered by error-bound specs against the
 *    exact twins rather than a DuckDB hash match.
 */
object Sketches {

  private val Dec = DecimalType(18, 4)

  /** Exact interpolated percentiles of event value per type. */
  def percentilesQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, 0.99)").as("p99"))

  /** Sketch twin of [[percentilesQuery]]: one-pass approximate quantiles. */
  def percentilesApproxQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99"))

  /** Sketch twin of TextAnalysis.vocab: HLL++ distinct-token counts —
    * fixed-size state per (lang) group instead of a (lang, token) shuffle
    * of the whole corpus. */
  def vocabApproxQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("lang"),
        explode(TextAnalysis.whitespaceTokens(lower(col("text")))).as("tok"))
      .groupBy("lang")
      .agg(
        approx_count_distinct(col("tok"), 0.01).as("n_distinct_tokens_approx"),
        count(lit(1)).as("n_tokens"))
}
