package graft.cli

import graft.operators.CorruptScan
import graft.sources.Catalog
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * CLI twin of the reference's CorruptRowsMR job (`CorruptRowsMR.java`), same
 * flag surface: scan a cell table, probe every row, write corrupted keys +
 * error summaries as TSV, report TOTAL/SUCCESS/FAILED counters.
 *
 * The probe: the reference re-GETs each row against HBase and catches
 * server-side corruption exceptions. Against our columnar cell store the
 * equivalent readability check is declarative — a cell is unreadable when
 * `--corruptExpr` (a SQL boolean over columns rowKey/family/qualifier/ts/
 * cellType/value) holds; the default sentinel matches values poisoned with
 * a leading NUL. `--traceCells true` logs every scanned cell (M6 — the
 * reference documents it as unsafe on large tables, `README.md:59`; same
 * warning applies).
 */
object CorruptRowsMain {

  val Usage: String =
    """usage: graft.cli.CorruptRowsMain --table <ns:table> --output <dir>
      |         [--corruptExpr <sql boolean over cell columns>]
      |         [--traceCells true|false]""".stripMargin

  val Known = Set("table", "output", "corruptExpr", "traceCells")

  val DefaultCorruptExpr = "startswith(cast(value as string), chr(0))"

  final case class Counters(total: Long, success: Long, failed: Long)

  def run(spark: SparkSession, args: Array[String]): Counters = {
    val p = Args.parse(args, Known, Usage)
    val table = p.required("table", Usage)
    val output = p.required("output", Usage)
    val corruptExpr = p.get("corruptExpr").getOrElse(DefaultCorruptExpr)
    val traceCells = p.bool("traceCells", default = false)

    if (!Catalog.exists(spark, table))
      Args.die(s"table '$table' does not exist", Usage)

    val cells = Catalog.load(spark, table)
    if (traceCells) {
      // M6 debug trace — per-cell logging, never for large prod tables
      cells.select(
          graft.functions.GraftFunctions.to_string_binary(col("rowKey")).as("row"),
          col("family"), col("qualifier").cast("string"), col("ts"),
          graft.functions.GraftFunctions.to_string_binary(col("value")).as("value"))
        .collect()
        .foreach(r => System.err.println(s"[trace] $r"))
    }

    val obs = Observation(s"corrupt_rows_$table")
    val probed = CorruptScan.withCounters(
      CorruptScan.probeDeclarative(cells, expr(corruptExpr)), obs)
    CorruptScan.writeTsv(CorruptScan.corruptReport(probed), output)

    val c = Counters(
      obs.get("TOTAL_ROWS").asInstanceOf[Long],
      obs.get("SUCCESS_ROWS").asInstanceOf[Long],
      obs.get("FAILED_ROWS").asInstanceOf[Long])
    // the reference's published "result schema" (README.md:44-46)
    println(s"TOTAL_ROWS=${c.total}")
    println(s"SUCCESS_ROWS=${c.success}")
    println(s"FAILED_ROWS=${c.failed}")
    c
  }

  def main(args: Array[String]): Unit = Args.runMain {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try run(spark, args) finally spark.stop()
  }
}
