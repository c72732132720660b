package graft.cli

import graft.operators.{StatsPlanner, TableStats}
import org.apache.spark.sql.SparkSession

/**
 * ANALYZE CLI — the troubleshooting tool around
 * [[graft.operators.TableStats]] and [[graft.operators.StatsPlanner]]:
 * print per-column statistics of a parquet table (row count, nulls, ndv
 * with the sketch-accuracy bound, min/max), and optionally explain the
 * stats-driven physical choice for a prospective join against a second
 * table. The sizing question a cluster operator asks before submitting
 * a 100 TB join — "does the dimension broadcast, and at how many
 * shuffle partitions does the output land?" — answered from two bounded
 * stats passes without running the join. Flag discipline follows the
 * reference's `--key value` tools (`CopyRow.java:45-98`).
 */
object AnalyzeMain {

  val Usage: String =
    """usage: graft.cli.AnalyzeMain --table <parquet dir> --columns <c1,c2,...>
      |         [--joinTable <parquet dir> --joinKeys <leftKey,rightKey>]""".stripMargin

  val Known = Set("table", "columns", "joinTable", "joinKeys")

  final case class ColStat(col: String, nRows: Long, nNulls: Long, ndv: Long,
      ndvOk: Boolean, min: String, max: String)

  def run(spark: SparkSession, args: Array[String]): (Seq[ColStat], Option[String]) = {
    val p = Args.parse(args, Known, Usage)
    val table = p.required("table", Usage)
    val columns = p.required("columns", Usage).split(',').map(_.trim).filter(_.nonEmpty)
    if (columns.isEmpty) Args.die("--columns must name at least one column", Usage)
    val df = spark.read.parquet(table)
    val missing = columns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      Args.die(s"columns not in table: ${missing.mkString(", ")}", Usage)

    val stats = TableStats.analyze(df, columns.toSeq).collect()
      .map(r => ColStat(r.getAs[String]("col_name"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_nulls"), r.getAs[Long]("ndv"),
        r.getAs[Boolean]("ndv_within_bound"),
        String.valueOf(r.getAs[Any]("min_value")),
        String.valueOf(r.getAs[Any]("max_value"))))
      .toSeq
    // col \t rows \t nulls \t ndv \t bound \t min \t max — TSV diagnostics
    stats.foreach(s => println(
      s"${s.col}\t${s.nRows}\t${s.nNulls}\t${s.ndv}\t" +
        s"${if (s.ndvOk) "OK" else "DRIFT"}\t${s.min}\t${s.max}"))

    val joinExplain = p.get("joinTable").map { jt =>
      val keys = p.required("joinKeys", Usage).split(',').map(_.trim)
      if (keys.length != 2)
        Args.die("--joinKeys must be exactly leftKey,rightKey", Usage)
      val d = StatsPlanner.decide(df, spark.read.parquet(jt), keys(0), keys(1))
      println(s"join\t${d.explain}")
      d.explain
    }
    (stats, joinExplain)
  }

  def main(args: Array[String]): Unit = Args.runMain {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, args) finally spark.stop()
  }
}
