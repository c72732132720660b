package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-dimension corpus statistics over an embedding column — the feature-
 * hygiene pass run before training or indexing a vector corpus: dead
 * dimensions (min == max), scale imbalance across dimensions (the reason
 * SQ8 keeps per-dimension scales — [[SqIndex]]), and drift between corpus
 * snapshots all read directly off this table.
 *
 * Each element is quantized to micro-units (`floor(x·10⁶ + 0.5)` as
 * BIGINT — the engine's tie-rule-free 6-decimal contract) BEFORE
 * aggregation, so the sum is an exact integer sum: associative, partition-
 * order independent, and replayable by any engine evaluating the same
 * arithmetic. min/max commute with the monotone quantization.
 *
 * Scale shape: one posexplode (n·d rows, narrow) into one hash
 * aggregation keyed by dimension — partial aggregation holds exactly d
 * rows of state per task regardless of corpus size, so the shuffle moves
 * only (#partitions · d) pre-combined rows. No windows, no collects.
 */
object EmbeddingStats {

  def dimStats(embeddings: DataFrame, col_ : String = "embedding"): DataFrame = {
    val micro = floor(col("_x").cast("double") * lit(1000000.0) + lit(0.5))
    embeddings
      .select(posexplode(col(col_)).as(Seq("_d", "_x")))
      .groupBy(col("_d").cast("bigint").as("dim"))
      .agg(
        count(lit(1)).as("n"),
        min(micro).as("min_micro"),
        max(micro).as("max_micro"),
        sum(micro).as("sum_micro"))
  }

  // Query-pack adapter ---------------------------------------------------

  def dimStatsQuery(spark: SparkSession, sfDir: String): DataFrame =
    dimStats(Tables.load(spark, sfDir, "embeddings"))
}
