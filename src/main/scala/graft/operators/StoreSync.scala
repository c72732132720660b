package graft.operators

import graft.model.CellTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Store repair — the HBase SyncTable analogue, closing the reference's
 * copy tooling loop: CopyRow copies cells (`CopyRow.java:128-136`),
 * [[StoreDiff]] verifies the copy (VerifyReplication), StoreSync REPAIRS
 * the divergence it finds. Instead of re-copying the table, it emits the
 * minimal mutation batch — Puts for cells the destination lacks or holds
 * with a different value, DeleteColumn markers for cells only the
 * destination has — so the sync's cost is proportional to the DIVERGENCE,
 * not the store (HBase SyncTable's design point, and the only shape that
 * survives 100 TB: a 0.1% drift syncs 0.1% of the data).
 *
 * Contract: after appending [[mutations]] to the destination,
 * `CellTable.visibleLatest(dest')` carries exactly the (rowKey, family,
 * qualifier, value) set of `CellTable.visibleLatest(source)`; repaired
 * cells are stamped `syncTs` (the timestamp-override discipline the
 * reference's CopyRow makes first-class, `CopyRow.java:118-123`), cells
 * that already matched keep their history untouched. `syncTs` must exceed
 * every live timestamp in the destination so repairs win the
 * latest-version race and deletions mask the full history below them.
 *
 * Scale shape: two latest-visible window passes (one per side, each a
 * single hash-partitioned shuffle on the coordinate) and ONE full-outer
 * join on (rowKey, family, qualifier). Over two same-N salted cell
 * stores the join inputs are already KeyGroupedPartitioning-co-located,
 * same as [[StoreDiff]]. Nothing driver-side; output ∝ divergence.
 */
object StoreSync {

  private val coord = Seq("rowKey", "family", "qualifier")

  /** Latest-visible values of both sides joined on the cell coordinate;
    * null on a side means the coordinate is absent there. */
  private def joined(source: DataFrame, dest: DataFrame): DataFrame = {
    val s = CellTable.visibleLatest(source)
      .select(col("rowKey"), col("family"), col("qualifier"),
        col("value").as("value_src"))
    val d = CellTable.visibleLatest(dest)
      .select(col("rowKey"), col("family"), col("qualifier"),
        col("value").as("value_dst"))
    s.join(d, coord, "full_outer")
  }

  /**
   * The repair batch: one cell per divergent coordinate. Puts carry the
   * source's latest visible value at `syncTs`; deletes are DeleteColumn
   * markers at `syncTs` (mask the coordinate's whole history). Matching
   * coordinates produce nothing.
   */
  def mutations(source: DataFrame, dest: DataFrame, syncTs: Long): DataFrame = {
    val j = joined(source, dest)
    val puts = j
      .filter(col("value_src").isNotNull &&
        (col("value_dst").isNull || col("value_src") =!= col("value_dst")))
      .select(col("rowKey"), col("family"), col("qualifier"),
        lit(syncTs).as("ts"), lit("Put").as("cellType"),
        col("value_src").as("value"))
    val dels = j
      .filter(col("value_src").isNull)
      .select(col("rowKey"), col("family"), col("qualifier"),
        lit(syncTs).as("ts"), lit("Delete").as("cellType"),
        lit(Array.empty[Byte]).as("value"))
    puts.unionByName(dels)
  }

  /** The destination as it reads after the repair batch lands — the
    * post-sync GET view (for frame-level use and the oracle query). */
  def syncedView(source: DataFrame, dest: DataFrame, syncTs: Long): DataFrame =
    CellTable.visibleLatest(dest.unionByName(mutations(source, dest, syncTs)))

  /** (op, n_cells) totals of a would-be repair — the dry-run summary
    * SyncTable prints before `--doPuts/--doDeletes`. */
  def summary(source: DataFrame, dest: DataFrame, syncTs: Long): DataFrame =
    mutations(source, dest, syncTs)
      .groupBy(col("cellType").as("op"))
      .agg(count(lit(1)).as("n_cells"))

  /**
   * Repair a destination cell-store DIRECTORY in place: append the
   * mutation batch through the DSv2 writer (layout — salted or region —
   * is preserved by the writer's manifest). Returns the number of
   * mutation cells written.
   */
  def sync(spark: SparkSession, source: DataFrame, destDir: String,
      syncTs: Long): Long = {
    val dest = spark.read.format("cellstore").load(destDir)
    val batch = mutations(source, dest, syncTs)
    // count + write in one pass via a cached narrow result would still
    // run the join twice; the batch is divergence-sized, so persist it
    val cached = batch.persist()
    val n = cached.count()
    if (n > 0)
      cached.write.format("cellstore").mode("append").save(destDir)
    cached.unpersist()
    n
  }
}
