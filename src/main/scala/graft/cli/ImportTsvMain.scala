package graft.cli

import graft.model.CellTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * TSV bulk ingest — the hbase-tools ImportTsv analogue, re-expressed as
 * one narrow Spark job into the cell store: each input line becomes one
 * cell per mapped column, the row key comes from the `HBASE_ROW_KEY`
 * column (parsed from the HBase-shell `\xHH` dialect through the same
 * codec the rest of the engine uses), and malformed lines go to the
 * error channel instead of failing the job (`--skipBadLines true`, the
 * reference family's flag) or abort it loudly (`false`, the default —
 * ImportTsv's own default behavior).
 *
 * Scale shape: textfile scan → split → explode, zero shuffles before the
 * store writer's own layout exchange. Bad-line counting depends on the
 * mode: with `--skipBadLines true` the tally rides a `Dataset.observe`
 * on the line scan, so the write IS the only pass (A1 discipline); with
 * the abort default the count is necessarily a separate pre-pass — the
 * job must refuse to write anything when a line is malformed, and that
 * decision cannot wait for the write that would have made it free.
 */
object ImportTsv {

  final case class Result(cells: Long, badLines: Long)

  /** (good cells, bad lines, bad-line observation) for a TSV file under a
    * column map like ImportTsv's `-Dimporttsv.columns`: one entry per TSV
    * field, `HBASE_ROW_KEY` marking the key column, the rest naming
    * qualifiers. The observation is attached to the shared line scan and
    * yields `n_bad` when any action over `cells` runs. */
  def parse(spark: SparkSession, file: String, columns: Seq[String],
      family: String, ts: Long, sep: String = "\t")
      : (DataFrame, DataFrame, org.apache.spark.sql.Observation) = {
    val keyIdx = columns.indexOf("HBASE_ROW_KEY")
    require(keyIdx >= 0, "columns must include HBASE_ROW_KEY")
    val obs = org.apache.spark.sql.Observation()
    val lines = spark.read.textFile(file).toDF("line")
      .withColumn("_p", split(col("line"),
        java.util.regex.Pattern.quote(sep), -1))
      .observe(obs, sum(when(size(col("_p")) =!= columns.length, 1L)
        .otherwise(0L)).as("n_bad"))
    val ok = size(col("_p")) === columns.length
    val bad = lines.filter(!ok).select(col("line"))
    val qualifiers = columns.zipWithIndex.filter(_._1 != "HBASE_ROW_KEY")
    val cellStructs = qualifiers.map { case (q, i) =>
      struct(
        lit(q).cast("binary").as("qualifier"),
        col("_p").getItem(i).cast("binary").as("value"))
    }
    val cells = lines.filter(ok)
      .select(
        graft.functions.GraftFunctions.to_bytes_binary(
          col("_p").getItem(keyIdx)).as("rowKey"),
        explode(array(cellStructs: _*)).as("cell"))
      .select(
        col("rowKey"),
        lit(family).as("family"),
        col("cell.qualifier").as("qualifier"),
        lit(ts).as("ts"),
        lit("Put").as("cellType"),
        col("cell.value").as("value"))
    (cells, bad, obs)
  }

  /** Ingest into a cell-store directory (append); returns counters. */
  def run(spark: SparkSession, file: String, columns: Seq[String],
      family: String, dest: String, ts: Long, buckets: Int,
      skipBadLines: Boolean, sep: String = "\t"): Result = {
    val (cells, bad, obs) = parse(spark, file, columns, family, ts, sep)
    if (!skipBadLines) {
      // abort mode: the bad count GATES the write, so it must be its own
      // pass — nothing may land in the store when a line is malformed
      val nBad = bad.count()
      if (nBad > 0)
        throw new IllegalArgumentException(
          s"$nBad malformed line(s); rerun with --skipBadLines true to drop them")
    }
    val writer = cells.write.format("cellstore").mode("append")
    (if (buckets > 0) writer.option("buckets", buckets.toString) else writer)
      .save(dest)
    // skip mode: the tally rode the write's own scan (observe) — one pass
    val nBad = obs.get("n_bad").asInstanceOf[Long]
    val nCells = spark.read.format("cellstore").load(dest).count()
    Result(nCells, nBad)
  }
}

/** `--key value` CLI front (D1/D2 discipline shared with the other mains). */
object ImportTsvMain {

  val Usage: String =
    """usage: graft.cli.ImportTsvMain --input <tsv file> --output <store dir>
      |         --columns HBASE_ROW_KEY,q1,q2,... --family <family>
      |         [--timestampToUse <epochMillis>] [--buckets <n>]
      |         [--separator <char>] [--skipBadLines true|false]""".stripMargin

  val Known = Set("input", "output", "columns", "family",
    "timestampToUse", "buckets", "separator", "skipBadLines")

  def run(spark: SparkSession, args: Array[String]): ImportTsv.Result = {
    val p = Args.parse(args, Known, Usage)
    val input = p.required("input", Usage)
    val output = p.required("output", Usage)
    val columns = p.required("columns", Usage).split(",").toSeq
    val family = p.required("family", Usage)
    if (!columns.contains("HBASE_ROW_KEY"))
      Args.die("--columns must include HBASE_ROW_KEY", Usage)
    val res = ImportTsv.run(spark, input, columns, family, output,
      ts = p.long("timestampToUse", System.currentTimeMillis()),
      buckets = p.long("buckets", 0L).toInt,
      skipBadLines = p.bool("skipBadLines", default = false),
      sep = p.get("separator").getOrElse("\t"))
    println(s"imported: store now holds ${res.cells} cells" +
      s" (skipped ${res.badLines} bad line(s))")
    res
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
