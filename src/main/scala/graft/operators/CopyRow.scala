package graft.operators

import graft.functions.BytesBinaryCodec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The CopyRow transform (SURVEY.md §7.2, reference `CopyRow.java`): fetch one
 * row's cells by row key (given in HBase-shell binary-string notation),
 * optionally rewrite every cell's timestamp, and hand the rebuilt cells to a
 * destination writer.
 *
 * Spark-first shape: `filter(rowKey = k) → withColumn(ts)` — a two-node
 * logical plan. The point filter on `BinaryType` is pushed into the Parquet
 * scan (min/max row-group pruning); at 100 TB against an HBase DSv2 source it
 * becomes a single-region GET. The timestamp rewrite (T1) is one projection;
 * cell immutability is native so the reference's `DEEP_COPY` has no analogue.
 */
object CopyRow {

  /**
   * Logical plan for the copy: the source row's cells, timestamps rewritten
   * when `overrideTs`. The OPERATOR requires an explicit ts so plans stay
   * deterministic; the reference's wall-clock default
   * (`CopyRow.java:63-64,76-79` — `currentTimeMillis` when
   * `--timestampToUse` is omitted) lives in the CLI layer
   * (`cli/CopyRowMain.scala`), which supplies `System.currentTimeMillis()`
   * exactly like the reference tool.
   */
  def plan(
      cells: DataFrame,
      rowKeyByteString: String,
      overrideTs: Boolean,
      tsToUse: Long): DataFrame = {
    val key = BytesBinaryCodec.decode(rowKeyByteString)
    val selected = cells.filter(col("rowKey") === lit(key))
    if (overrideTs) selected.withColumn("ts", lit(tsToUse)) else selected
  }

  /**
   * Execute the copy into a destination append. Mirrors the reference CLI
   * behaviors: empty-row guard (T3, `CopyRow.java:114-117` — warn, write
   * nothing) and the per-cell Put loop (K1) — except ours batches the write
   * by partition instead of one RPC per cell.
   *
   * @return number of cells copied (0 ⇒ the T3 guard fired)
   */
  def run(
      cells: DataFrame,
      rowKeyByteString: String,
      overrideTs: Boolean,
      tsToUse: Long)(write: DataFrame => Unit): Long = {
    val p = plan(cells, rowKeyByteString, overrideTs, tsToUse)
    // T3 guard: limit(1) probe instead of a full count — cheap at any scale.
    if (p.limit(1).isEmpty) {
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"row '$rowKeyByteString' has no cells in source; nothing copied")
      0L
    } else {
      val persisted = p.cache()
      try {
        val n = persisted.count()
        write(persisted)
        n
      } finally persisted.unpersist()
    }
  }
}
