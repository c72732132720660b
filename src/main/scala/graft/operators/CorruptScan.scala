package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The corrupt-row probe pipeline (SURVEY.md §7.4, reference
 * `CorruptRowsMR.java`): enumerate every row key of a table, probe each row's
 * readability, and route results into a success counter vs. a
 * `(rowKey, errorSummary)` diagnostic channel.
 *
 * Spark shape: `scan keys (F1/F2 projection) → probe → observe(counters) →
 * filter(failed) → TSV sink`. The whole pipeline is narrow except the key
 * de-duplication; counters ride on `Dataset.observe` (exactly-once on action
 * completion — stronger than MR counters under task retry).
 */
object CorruptScan {

  /** Per-partition probe resource: the M3 lazy-connection pattern
    * (`CorruptRowsMR.java:104-123,169-176`) as an explicit lifecycle. */
  trait RowProbe extends Serializable {
    def open(): Unit = ()
    /** Throws iff the row is unreadable. */
    def probe(rowKey: Array[Byte]): Unit
    def close(): Unit = ()
  }

  /** Probe outcome row — the M4 error channel as data, never an exception
    * crossing the plan. */
  final case class ProbeResult(
      rowKey: Array[Byte],
      ok: Boolean,
      errorClass: String,
      errorMessage: String)

  /**
   * F1+F2: collapse the cell table to one record per row key. Expressed as
   * an aggregate (not window) so Catalyst plans a partial (map-side)
   * aggregate before the exchange — the same network win as HBase's
   * FirstKeyOnlyFilter+KeyOnlyFilter, where value bytes never travel.
   */
  def rowKeys(cells: DataFrame): DataFrame =
    cells.select("rowKey").groupBy("rowKey").agg(count(lit(1)).as("_ncells"))
      .select("rowKey")

  /**
   * Probe every key with a per-partition resource (M2+M3): `mapPartitions`
   * opens the probe once per partition, reuses it across all keys, closes it
   * at exhaustion — the Spark idiom for the reference's per-mapper HBase
   * connection. Used when the probe targets an external store.
   */
  def probeWithResource(keys: DataFrame, mkProbe: () => RowProbe): Dataset[ProbeResult] = {
    implicit val enc = Encoders.product[ProbeResult]
    keys.select("rowKey").as(Encoders.BINARY).mapPartitions { iter =>
      val probe = mkProbe()
      probe.open()
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; probe.close() }
      new Iterator[ProbeResult] {
        def hasNext: Boolean = {
          val h = iter.hasNext
          if (!h) closeOnce()
          h
        }
        def next(): ProbeResult = {
          val k = iter.next()
          try { probe.probe(k); ProbeResult(k, ok = true, null, null) }
          catch { case e: Exception =>
            ProbeResult(k, ok = false, e.getClass.getSimpleName, e.getMessage)
          }
        }
      }
    }
  }

  /**
   * Fully declarative probe for in-engine storage: re-read the table and
   * classify each key by a corruption predicate over its cells. Semantically
   * the reference's scan→GET loop is a **left self-lookup-join with an error
   * channel** (SURVEY.md M2) — expressing it as a join lets Catalyst pick
   * broadcast vs. shuffled-hash and keeps it codegen'd end to end.
   *
   * @param corruptPred predicate over cell rows marking unreadable cells
   */
  def probeDeclarative(cells: DataFrame, corruptPred: org.apache.spark.sql.Column): DataFrame = {
    cells
      .groupBy("rowKey")
      .agg(max(when(corruptPred, 1).otherwise(0)).as("_corrupt"))
      .select(
        col("rowKey"),
        (col("_corrupt") === 0).as("ok"),
        when(col("_corrupt") === 1, lit("CorruptCellException")).as("errorClass"),
        when(col("_corrupt") === 1, lit("poisoned cell value\ndetail: value sentinel matched"))
          .as("errorMessage"))
  }

  /**
   * M5 — exception-message normalization, exactly the reference's branch
   * structure (`CorruptRowsMR.java:150-161`): null/blank message → "n/a";
   * otherwise the first line of a `\r\n|\r|\n` split (note: the blank check
   * happens BEFORE the split, so a message like "\rX" yields an empty first
   * line, not "n/a"). Output format: `"<SimpleClass>, message: <line1>"`.
   */
  def normalizeError(errorClass: org.apache.spark.sql.Column,
                     errorMessage: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(errorClass, lit(", message: "),
      when(errorMessage.isNull || trim(errorMessage) === "", lit("n/a"))
        .otherwise(element_at(split(errorMessage, "\r\n|\r|\n", 2), 1)))

  /**
   * A1 counters via `observe`: TOTAL/SUCCESS/FAILED materialize exactly once
   * when the attached action completes. Listen via `QueryExecutionListener`
   * or read `df.observedMetrics` after collect in tests.
   */
  def withCounters(probed: DataFrame, name: String = "corrupt_scan"): DataFrame =
    probed.observe(name,
      count(lit(1)).as("TOTAL_ROWS"),
      count(when(col("ok"), 1)).as("SUCCESS_ROWS"),
      count(when(!col("ok"), 1)).as("FAILED_ROWS"))

  /** Observation-handle variant for callers that read the counters back. */
  def withCounters(probed: DataFrame, obs: org.apache.spark.sql.Observation): DataFrame =
    probed.observe(obs,
      count(lit(1)).as("TOTAL_ROWS"),
      count(when(col("ok"), 1)).as("SUCCESS_ROWS"),
      count(when(!col("ok"), 1)).as("FAILED_ROWS"))

  /** The diagnostic channel: failed keys, printable-encoded, with the
    * normalized summary — the reference's TSV record (K2). */
  def corruptReport(probed: DataFrame): DataFrame =
    probed.filter(!col("ok"))
      .select(
        GraftFunctions.to_string_binary(col("rowKey")).as("row_key"),
        normalizeError(col("errorClass"), col("errorMessage")).as("error"))

  /** K2 sink: tab-separated text, `_SUCCESS` + `part-*` layout like the
    * reference's `TextOutputFormat` dirs (`README.md:71-80`). */
  def writeTsv(report: DataFrame, path: String): Unit =
    report.select(concat_ws("\t", col("row_key"), col("error")).as("line"))
      .write.mode("overwrite").text(path)

  /** End-to-end declarative pipeline, ready for the query pack. */
  def pipeline(cells: DataFrame, corruptPred: org.apache.spark.sql.Column): DataFrame =
    corruptReport(withCounters(probeDeclarative(cells, corruptPred)))
}
