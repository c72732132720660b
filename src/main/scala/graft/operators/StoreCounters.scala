package graft.operators

import graft.model.CellTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed counters — the HBase `Increment` analogue
 * (`Table.incrementColumnValue`): counter cells hold an 8-byte big-endian
 * long; an increment batch adds per-coordinate deltas to the LATEST
 * VISIBLE counter value — Delete markers mask, so a deleted counter
 * resumes from 0 just like a missing one (both are absent to an HBase
 * GET, and increments create counters — HBase's contract) — and writes
 * the sums as new cell versions, leaving history intact.
 *
 * The batch analogue of HBase's per-RPC atomicity: one Spark job applies
 * the whole delta frame atomically-per-coordinate — deltas for the same
 * (rowKey, family, qualifier) are summed BEFORE the read-modify-write, so
 * the result is order-independent and idempotent per batch, which is what
 * an RMW loop over individual Increments can't give you at 100 TB.
 *
 * Scale shape: two hash aggregations (latest-per-coordinate over base,
 * sum-per-coordinate over deltas — both with map-side partial combine)
 * and one join on the shared coordinate key. The join side built from the
 * delta BATCH is bounded by the batch's distinct coordinates, so AQE
 * broadcasts it for small batches; over two same-N salted cell stores the
 * coordinate join is storage-partitioned (zero exchange), same as
 * [[StoreDiff]].
 */
object StoreCounters {

  /** 8-byte big-endian counter codec (HBase `Bytes.toBytes(long)`). */
  def encodeCounter(v: Column): Column = CellTable.bigEndianKey(v)
  def decodeCounter(v: Column): Column = CellTable.keyToLong(v)

  /**
   * Apply an increment batch to counter cells. `deltas` columns: rowKey,
   * family, qualifier, delta (long). Returns the RESULT cells (one new
   * version per incremented coordinate at `newTs`) — what HBase Increment
   * returns to the caller; append them to the store to commit.
   */
  def applyIncrements(base: DataFrame, deltas: DataFrame, newTs: Long): DataFrame = {
    val coord = Seq("rowKey", "family", "qualifier")
    // The delete-masked latest read (CellTable.visibleLatestValue's shape:
    // a coordinate whose newest Put is at or before its newest Delete
    // marker is ABSENT, so its counter resumes from 0 — HBase GET
    // visibility). Decoded BEFORE aggregating: max_by over a binary value
    // plans a SortAggregate (immutable buffer), max_by(long, long)
    // hash-aggregates with map-side partials — counters are longs by
    // contract anyway, so this read keeps the all-primitive buffer.
    val put = col("cellType") =!= "Delete"
    val latest = base
      .select(col("rowKey"), col("family"), col("qualifier"), col("ts"),
        col("cellType"), decodeCounter(col("value")).as("_prevLong"))
      .groupBy(coord.map(col): _*)
      .agg(
        max(when(!put, col("ts"))).as("_delTs"),
        max(when(put, col("ts"))).as("_putTs"),
        max_by(when(put, col("_prevLong")), when(put, col("ts"))).as("_prev"))
      .filter(col("_putTs").isNotNull &&
        (col("_delTs").isNull || col("_putTs") > col("_delTs")))
      .select(col("rowKey"), col("family"), col("qualifier"), col("_prev"))
    val summed = deltas
      .groupBy(coord.map(col): _*)
      .agg(sum(col("delta")).as("_delta"))
    summed.join(latest, coord, "left")
      .select(
        col("rowKey"), col("family"), col("qualifier"),
        lit(newTs).as("ts"),
        lit("Put").as("cellType"),
        encodeCounter(coalesce(col("_prev"), lit(0L)) + col("_delta")).as("value"))
  }

  /** The committed view: base history plus the new counter versions. */
  def incremented(base: DataFrame, deltas: DataFrame, newTs: Long): DataFrame =
    base.unionByName(applyIncrements(base, deltas, newTs))
}
