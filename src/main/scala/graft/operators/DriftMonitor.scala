package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Corpus drift monitor — the ops check a continuously-ingested training
 * corpus needs: compare the distribution of a signal (length bands,
 * quality bands, source mix) between two snapshots and score the shift.
 *
 * The divergence is the chi-square-style symmetric statistic
 * Σ (p−q)²/(p+q) (bounded in [0, 2], 0 iff identical) rather than
 * PSI/KL: it needs NO logarithm, so every per-band term is a short fixed
 * IEEE sequence over identical inputs in both engines — micro-quantized
 * half-up, it is oracle-matchable bit-for-bit, the same reasoning as the
 * engine's other quantized scores.
 *
 * Shape: one count aggregation per side (map-side combined over the band
 * key), a full-outer join on the bounded band set, and window totals
 * over that bounded set (documented: #bands rows, never corpus rows).
 */
object DriftMonitor {

  /**
   * Per-band drift between two snapshots sharing a `band` column.
   * Emits (band, n_a, n_b, term_micro) — Σ term_micro is the corpus
   * drift statistic in micro-units.
   */
  def snapshotDrift(a: DataFrame, b: DataFrame): DataFrame =
    driftFromCounts(
      a.groupBy("band").agg(count(lit(1)).as("n_a")),
      b.groupBy("band").agg(count(lit(1)).as("n_b")))

  /** Histogram-level entry point — (band, n_a) vs (band, n_b) counts,
    * for callers that already hold the histograms (the streaming monitor's
    * cumulative aggregation state). */
  def driftFromCounts(ca: DataFrame, cb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = ca.join(cb, Seq("band"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    // totals over the BOUNDED band set — a windowless frame is fine here
    // (rows = #bands, never corpus-sized)
    val w = Window.partitionBy()
    val p = col("n_a").cast("double") / sum(col("n_a")).over(w).cast("double")
    val q = col("n_b").cast("double") / sum(col("n_b")).over(w).cast("double")
    joined.select(col("band"), col("n_a"), col("n_b"),
      when(col("n_a") + col("n_b") === 0, 0L)
        .otherwise(floor((p - q) * (p - q) / (p + q) * lit(1000000.0) + lit(0.5))
          .cast("bigint"))
        .as("term_micro"))
  }

  /** Length band: floor(n_chars / width), capped. */
  def lengthBand(width: Int, maxBand: Int): Column =
    least(floor(col("n_chars").cast("double") / width), lit(maxBand))
      .cast("bigint")

  /** Query-pack adapter: drift between the even- and odd-id halves of the
    * documents corpus (a synthetic old/new snapshot pair) over 100-char
    * length bands capped at 19. */
  def corpusDriftQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("band", lengthBand(100, 19))
    snapshotDrift(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
  }
}
