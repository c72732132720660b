package graft.operators

import graft.model.CellTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Conditional and read-modify-write mutations — the rest of HBase's
 * mutation surface next to Put (store write), Delete markers, and
 * [[StoreCounters]] (Increment):
 *
 *  - `checkAndPut` (`Table.checkAndMutate`): each mutation names a CHECK
 *    cell and an expected value (null = "must be absent"); the put applies
 *    only when the latest version of the check cell matches. Rejected
 *    mutations surface on an audit channel, never as task failures — the
 *    same error-channel discipline as CorruptScan (SURVEY M4).
 *  - `applyAppends` (`Table.append`): value = current bytes ++ suffix as a
 *    new version; missing cells append onto empty (Append creates cells,
 *    like Increment).
 *
 * Batch semantics: mutations are applied against the base's latest
 * VISIBLE versions — [[CellTable.visibleLatestValue]], so Delete markers
 * mask: a deleted coordinate reads as ABSENT (an expected-null check
 * passes against it; an append starts from empty), exactly like an HBase
 * GET would see it. One decision per mutation row. Unlike Increment
 * (deltas commute, so the batch pre-sums), two checkAndPut mutations on
 * the SAME check cell do not commute; this operator evaluates all checks
 * against the pre-batch state — the deterministic bulk contract,
 * documented here rather than HBase's arrival-order races.
 *
 * Scale shape: one latest-visible-per-coordinate aggregation over base
 * (single hash shuffle; the binary value forces the final step to a
 * SortAggregate — see [[CellTable.visibleLatestValue]]) + one join
 * against the batch-bounded mutation frame (AQE broadcasts small
 * batches; same-N salted stores co-partition).
 */
object StoreMutations {

  /**
   * Evaluate a checkAndPut batch. `muts` columns: rowKey, family,
   * checkQualifier, expected (binary or null), qualifier, value — check
   * cell and put target may differ (HBase allows it). Returns every
   * mutation with an `applied` flag; put cells for the applied ones are
   * at ts = `newTs`.
   */
  def checkAndPut(base: DataFrame, muts: DataFrame, newTs: Long): DataFrame = {
    val latest = CellTable.visibleLatestValue(base)
      .withColumnRenamed("value", "_current").drop("ts")
      .withColumnRenamed("qualifier", "checkQualifier")
    muts.join(latest, Seq("rowKey", "family", "checkQualifier"), "left")
      .select(
        col("rowKey"), col("family"), col("qualifier"),
        lit(newTs).as("ts"),
        lit("Put").as("cellType"),
        col("value"),
        // null-safe equality IS the check semantics: null expected matches
        // exactly an absent cell; a present cell never matches null; and a
        // missing cell never matches a concrete expected value.
        (col("expected") <=> col("_current")).as("applied"))
  }

  /** The cells an applied checkAndPut batch commits (append to the store). */
  def appliedCells(checked: DataFrame): DataFrame =
    checked.filter(col("applied")).drop("applied")

  /** The audit channel: mutations whose check failed. */
  def rejected(checked: DataFrame): DataFrame =
    checked.filter(!col("applied")).drop("applied")

  /**
   * Apply an append batch. `appends` columns: rowKey, family, qualifier,
   * suffix (binary). Multiple appends to one coordinate concatenate in
   * (rowKey, family, qualifier, suffix) byte order — a deterministic
   * batch ordering where HBase has arrival order. Missing AND deleted
   * cells append onto empty (Append creates cells, and a Delete-masked
   * coordinate is absent). Returns the new cell versions at `newTs`.
   */
  def applyAppends(base: DataFrame, appends: DataFrame, newTs: Long): DataFrame = {
    val latest = CellTable.visibleLatestValue(base)
      .withColumnRenamed("value", "_current").drop("ts")
    val batched = appends
      .groupBy(col("rowKey"), col("family"), col("qualifier"))
      .agg(array_join(array_sort(collect_list(hex(col("suffix")))), "")
        .as("_sufhex"))
    batched.join(latest, Seq("rowKey", "family", "qualifier"), "left")
      .select(
        col("rowKey"), col("family"), col("qualifier"),
        lit(newTs).as("ts"),
        lit("Put").as("cellType"),
        concat(coalesce(col("_current"), lit(Array.emptyByteArray)),
          unhex(col("_sufhex"))).as("value"))
  }
}
