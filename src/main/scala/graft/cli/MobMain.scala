package graft.cli

import graft.operators.MobStore
import org.apache.spark.sql.SparkSession

/**
 * MOB-store maintenance CLI around [[graft.operators.MobStore]]: storage
 * accounting (`--stats`), main-store major compaction (`--compact`, never
 * rewrites a blob file), and orphan-blob reclaim (`--reclaim`, the step
 * that makes subject purges real for blob bytes). Flag discipline follows
 * the reference's `--key value` tools (`CopyRow.java:45-98`); output is
 * the TSV diagnostic format.
 */
object MobMain {

  val Usage: String =
    """usage: graft.cli.MobMain --dir <mob store dir>
      |         [--stats true] [--compact true] [--reclaim true]
      |         [--maxVersions <n>]""".stripMargin

  val Known = Set("dir", "stats", "compact", "reclaim", "maxVersions")

  def run(spark: SparkSession, args: Array[String]): Unit = {
    val p = Args.parse(args, Known, Usage)
    val dir = p.required("dir", Usage)
    val doStats = p.bool("stats", default = false)
    val doCompact = p.bool("compact", default = false)
    val doReclaim = p.bool("reclaim", default = false)
    if (!doStats && !doCompact && !doReclaim)
      Args.die("one of --stats/--compact/--reclaim true is required", Usage)
    val maxVersions = p.long("maxVersions", default = 1L).toInt
    if (maxVersions <= 0) Args.die("--maxVersions must be positive", Usage)

    if (doCompact) {
      MobStore.compactMain(spark, dir, maxVersions)
      println(s"compact\tmain\tmaxVersions=$maxVersions\tOK")
    }
    if (doReclaim) {
      val (kept, dropped) = MobStore.reclaimMob(spark, dir)
      println(s"reclaim\tkept=$kept\tdropped=$dropped\tOK")
    }
    if (doStats) {
      // family \t n_refs \t n_plain \t main_bytes \t n_blobs \t blob_bytes
      MobStore.mobStats(spark, dir).collect()
        .sortBy(_.getAs[String]("family"))
        .foreach(r => println(Seq(
          r.getAs[String]("family"), r.getAs[Long]("n_refs"),
          r.getAs[Long]("n_plain"), r.getAs[Long]("main_bytes"),
          r.getAs[Long]("n_blobs"), r.getAs[Long]("blob_bytes")).mkString("\t")))
    }
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
