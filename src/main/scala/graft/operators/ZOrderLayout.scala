package graft.operators

import graft.functions.ZOrderFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Z-order clustering for scan layouts — multi-dimensional pruning without
 * an index: rows are range-partitioned AND sorted by the Morton code of two
 * dimensions, so every written file (and every parquet row group inside it)
 * covers a small rectangle of the (a, b) space. Parquet column min/max
 * stats then prune scans filtered on EITHER dimension — the classic fix for
 * "sorted by key A, but half my queries filter on B".
 *
 * 100 TB shape: one range exchange on the z-value (sampled bounds, same as
 * any repartitionByRange), then a per-partition sort; no extra passes, no
 * driver state. Pruning needs no reader cooperation beyond the parquet
 * stats evaluation every engine already does.
 */
object ZOrderLayout {

  /** Space-filling curve choices for [[cluster]]: Morton (bit interleave,
    * cheapest to compute, discontinuous at quadrant seams) or Hilbert
    * (continuous — every contiguous index range is one connected blob, so
    * per-file bounding boxes are tighter; ZOrderSpec measures the
    * difference). */
  val Curves: Set[String] = Set("morton", "hilbert")

  /** Cluster `df` on the space-filling-curve index of (a, b) into
    * `numFiles` files. */
  def cluster(df: DataFrame, a: String, b: String, numFiles: Int,
      curve: String = "morton"): DataFrame = {
    require(Curves.contains(curve), s"unknown curve '$curve' (${Curves.mkString("|")})")
    val idx =
      if (curve == "hilbert")
        ZOrderFunctions.hvalue(col(a).cast("long"), col(b).cast("long"))
      else ZOrderFunctions.zvalue(col(a).cast("long"), col(b).cast("long"))
    df.withColumn("_z", idx)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Write a curve-clustered parquet layout. */
  def write(df: DataFrame, a: String, b: String, path: String, numFiles: Int,
      curve: String = "morton"): Unit =
    cluster(df, a, b, numFiles, curve).write.mode("overwrite").parquet(path)

  /** Per-file [min, max] of `colName` — the pruning-tightness evidence:
    * the narrower the per-file range, the more files a point/range filter
    * on that column skips. */
  def fileRanges(spark: SparkSession, path: String, colName: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colName)).as("lo"), max(col(colName)).as("hi"))
}
