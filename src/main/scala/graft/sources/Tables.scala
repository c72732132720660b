package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Fixture-table source (TESTDATA.md). One parquet per table; at the 100 TB
 * target this is the seam where an HBase DSv2 connector (or any other
 * `spark.read.format(...)`) plugs in — everything downstream consumes plain
 * DataFrames and never knows the storage.
 *
 * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's reader rejects
 * outright (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.
 * nanosAsLong` is set; we read it as nano longs and normalize to a
 * microsecond `TimestampType` column so downstream operators see a plain
 * timestamp. (DuckDB keeps ns precision; all oracle comparisons on events
 * aggregate at ≥second granularity, where truncation is invisible.)
 */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Raw events schema (ts as nano longs) for streaming readers. */
  def eventsRawSchema(spark: SparkSession, sfDir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }

  /** The ns-long → TimestampType normalization, shared batch/stream. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
