package graft.cli

import graft.operators.DatasetExport
import org.apache.spark.sql.SparkSession

/**
 * Dataset-export CLI — the hand-off tool around
 * [[graft.operators.DatasetExport]]: shard a curated parquet corpus with
 * a recomputed-integrity manifest, or re-verify a previous export. Flag
 * discipline follows the reference's `--key value` tools
 * (`CopyRow.java:45-98`): unknown flags die with usage, required flags
 * are enforced, output is TSV per shard like the diagnostic sinks.
 */
object ExportMain {

  val Usage: String =
    """usage: graft.cli.ExportMain --outDir <dir>
      |         (--corpus <parquet dir> [--shards <n>] | --verify true)""".stripMargin

  val Known = Set("outDir", "corpus", "shards", "verify")

  final case class ShardRow(shard: Long, nDocs: Long, nTokens: Long, ok: Boolean)

  def run(spark: SparkSession, args: Array[String]): Seq[ShardRow] = {
    val p = Args.parse(args, Known, Usage)
    val outDir = p.required("outDir", Usage)
    val corpus = p.get("corpus")
    val verifyOnly = p.get("verify").exists(_.toBoolean)
    if (corpus.isEmpty && !verifyOnly)
      Args.die("either --corpus (export) or --verify true is required", Usage)

    corpus.foreach { c =>
      val n = p.long("shards", default = 8L).toInt
      if (n <= 0) Args.die("--shards must be positive", Usage)
      DatasetExport.exportShards(spark.read.parquet(c), outDir, n)
    }
    val rows = DatasetExport.verifyExport(spark, outDir).collect()
      .map(r => ShardRow(r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Boolean]("manifest_ok")))
      .sortBy(_.shard).toSeq
    // shard \t n_docs \t n_tokens \t OK|MISMATCH — TSV diagnostic format
    rows.foreach(r => println(
      s"${r.shard}\t${r.nDocs}\t${r.nTokens}\t${if (r.ok) "OK" else "MISMATCH"}"))
    if (rows.exists(!_.ok))
      System.err.println(s"[export] ${rows.count(!_.ok)} shard(s) FAILED verification")
    rows
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
