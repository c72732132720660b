package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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

  /** Misra-Gries state: bounded counter map + total stream length. */
  final case class MGState(counters: Map[String, Long], processed: Long)

  /**
   * Misra-Gries frequent-items sketch as a typed [[Aggregator]] — the
   * bounded-memory answer to "top tokens over 100 TB": at most `k`
   * counters per group, single pass, MERGEABLE partial states (map-side
   * combine works), versus the exact formulation's (group, token) shuffle
   * of the whole corpus.
   *
   * Guarantees (standard MG): every item with true frequency > n/(k+1)
   * is present, and each reported count under-estimates by at most the
   * total decrement debt. When a group's distinct-item count is ≤ k no
   * decrement or merge-trim ever fires, so counts are EXACT — the regime
   * `q_heavy_hitters` runs in (fixture vocab ≈ 31 ≪ 256), which is what
   * lets DuckDB oracle-check a sketch operator at all.
   */
  class MisraGries(k: Int) extends Aggregator[String, MGState, Seq[(String, Long)]] {
    require(k >= 1)
    override def zero: MGState = MGState(Map.empty, 0L)

    override def reduce(s: MGState, x: String): MGState = {
      val c = s.counters
      if (c.contains(x)) MGState(c.updated(x, c(x) + 1L), s.processed + 1)
      else if (c.size < k) MGState(c.updated(x, 1L), s.processed + 1)
      else {
        // decrement-all step: drop zeroed counters (classic MG)
        val dec = c.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
        MGState(dec, s.processed + 1)
      }
    }

    override def merge(a: MGState, b: MGState): MGState = {
      val combined = (a.counters.keySet ++ b.counters.keySet).iterator.map { t =>
        t -> (a.counters.getOrElse(t, 0L) + b.counters.getOrElse(t, 0L))
      }.toMap
      val trimmed =
        if (combined.size <= k) combined
        else {
          // subtract the (k+1)-th largest count from everyone (the merge
          // analogue of decrement-all); error bounds add across merges
          val kth = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
          combined.view.mapValues(_ - kth).filter(_._2 > 0L).toMap
        }
      MGState(trimmed, a.processed + b.processed)
    }

    /** Counters sorted (count desc, token asc) — deterministic ties. */
    override def finish(s: MGState): Seq[(String, Long)] =
      s.counters.toSeq.sortBy { case (t, n) => (-n, t) }

    override def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Top-10 tokens per language via the MG sketch (exact regime — see
    * [[MisraGries]]; the oracle recomputes the same top-10 exactly). */
  def heavyHittersQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val mg = udaf(new MisraGries(256))
    Tables.load(spark, sfDir, "documents")
      .select(col("lang"),
        explode(TextAnalysis.whitespaceTokens(lower(col("text")))).as("tok"))
      .groupBy("lang")
      .agg(mg(col("tok")).as("hh"))
      .select(col("lang"), posexplode(expr("slice(hh, 1, 10)")))
      .select(
        col("lang"),
        (col("pos") + 1).cast("bigint").as("rank"),
        col("col._1").as("tok"),
        col("col._2").as("cnt"))
  }
}
