package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cell-level store comparison — the HBase VerifyReplication analogue, and
 * the natural companion to the reference's copy tooling (CopyRow copies
 * cells verbatim, `CopyRow.java:128-136`; this verifies a copy): classify
 * every cell coordinate across two cell frames as matched, present only on
 * one side, or value-divergent.
 *
 * Shape: ONE full-outer join on the full cell coordinate. When both sides
 * are same-N salted stores the scans report
 * `KeyGroupedPartitioning(bucket(N, rowKey))` and the join keys contain
 * rowKey, so with `spark.sql.requireAllClusterKeysForCoPartition=false`
 * (partition keys are a SUBSET of the coordinate join keys) the
 * storage-partitioned-join path applies — two stores diff with no shuffle
 * of either side (asserted in StoreDiffSpec). Output is proportional to
 * the DIVERGENCE, not the stores ([[report]] filters matches out before
 * anything wide happens).
 */
object StoreDiff {

  /** Every coordinate with its classification. */
  def diff(source: DataFrame, dest: DataFrame): DataFrame = {
    val coord = Seq("rowKey", "family", "qualifier", "ts")
    val a = source.select(
      col("rowKey"), col("family"), col("qualifier"), col("ts"),
      col("value").as("value_src"))
    val b = dest.select(
      col("rowKey"), col("family"), col("qualifier"), col("ts"),
      col("value").as("value_dst"))
    a.join(b, coord, "full_outer")
      .select(
        col("rowKey"), col("family"), col("qualifier"), col("ts"),
        when(col("value_src").isNull, "ONLY_DEST")
          .when(col("value_dst").isNull, "ONLY_SOURCE")
          .when(col("value_src") =!= col("value_dst"), "VALUE_MISMATCH")
          .otherwise("MATCH").as("status"),
        col("value_src"), col("value_dst"))
  }

  /** Divergent cells only — the actionable output. */
  def report(source: DataFrame, dest: DataFrame): DataFrame =
    diff(source, dest).filter(col("status") =!= "MATCH")

  /** (status, count) totals — the CorruptRows-style counter summary. */
  def summary(source: DataFrame, dest: DataFrame): DataFrame =
    diff(source, dest).groupBy("status").agg(count(lit(1)).as("n_cells"))
}
