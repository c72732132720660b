package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Fixture-table source (TESTDATA.md). One parquet per table; at the 100 TB
 * target this is the seam where an HBase DSv2 connector (or any other
 * `spark.read.format(...)`) plugs in — everything downstream consumes plain
 * DataFrames and never knows the storage.
 *
 * `events.ts` has shipped with two different physical encodings across
 * fixture generations — TIMESTAMP(NANOS) (which Spark reads only as nano
 * longs under `spark.sql.legacy.parquet.nanosAsLong`) and plain
 * TIMESTAMP(MICROS) (which Spark reads as TIMESTAMP_NTZ or TIMESTAMP
 * depending on writer metadata). The load seam is the engine's storage
 * boundary, so it adapts to the OBSERVED schema rather than hard-coding
 * one historical encoding: see [[normalizeEventTs]]. Downstream operators
 * always see a plain session-zoned `TimestampType` `ts` (session tz is
 * pinned UTC everywhere, so the NTZ→TZ cast is value-preserving).
 */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized table row count — parquet footer metadata over an
    * immutable fixture path, the number a 100 TB deployment reads from
    * its CATALOG (the scaledPlanes/scaledNlist scaladocs' own framing).
    * The scale-adaptive parameter ladders consult it on every query
    * construction; without the memo each ANN tier paid a count job per
    * invocation (13 of them inside one q_ann_recall pass). */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def rowCount(spark: SparkSession, sfDir: String, name: String): Long =
    countCache.computeIfAbsent(s"$sfDir/$name",
      _ => load(spark, sfDir, name).count())

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // harmless for µs fixtures; required so a ns fixture reads (as longs)
      // instead of failing with PARQUET_TYPE_ILLEGAL
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Raw events schema (pre-normalization) for streaming readers. */
  def eventsRawSchema(spark: SparkSession, sfDir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }

  /** Normalize `ts` to session-zoned `TimestampType`, branching on the
    * OBSERVED dtype (shared batch/stream):
    *  - `LongType`: ns-as-long fixture → truncate to µs, reinterpret
    *  - `TimestampNTZType`: µs fixture without UTC-adjust metadata → cast
    *    (session tz pinned UTC, so wall-clock == instant)
    *  - `TimestampType`: already what downstream expects → pass through */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other; expected ns-long, " +
          "TIMESTAMP_NTZ, or TIMESTAMP")
    }
}
