package graft.cli

import graft.operators.StoreDoctor
import org.apache.spark.sql.SparkSession

/**
 * Store consistency CLI around [[graft.operators.StoreDoctor]] — the
 * `hbase hbck` analogue: layout / file-order / region-overlap / bloom
 * checks on a cell-store dir, plus ref/blob integrity for a MOB root.
 * Flag discipline follows the reference's `--key value` tools; output is
 * the TSV diagnostic format; exit is non-zero iff any check ERRORs.
 */
object StoreDoctorMain {

  val Usage: String =
    "usage: graft.cli.StoreDoctorMain (--store <cellstore dir> | --mobRoot <mob store dir>)"

  val Known = Set("store", "mobRoot")

  def run(spark: SparkSession, args: Array[String]): Seq[StoreDoctor.CheckRow] = {
    val p = Args.parse(args, Known, Usage)
    val store = p.get("store")
    val mobRoot = p.get("mobRoot")
    if (store.isEmpty && mobRoot.isEmpty)
      Args.die("one of --store or --mobRoot is required", Usage)
    val frames =
      store.map(StoreDoctor.diagnose(spark, _)).toSeq ++
        mobRoot.map(StoreDoctor.diagnoseMob(spark, _)).toSeq
    val rows = frames.flatMap(_.collect().map(r => StoreDoctor.CheckRow(
      r.getAs[String]("check"), r.getAs[String]("scope"),
      r.getAs[String]("status"), r.getAs[String]("detail"))))
    rows.foreach(r => println(s"${r.check}\t${r.status}\t${r.detail}"))
    if (rows.exists(_.status == "ERROR"))
      System.err.println(s"[doctor] ${rows.count(_.status == "ERROR")} check(s) FAILED")
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
    try {
      val rows = run(spark, args)
      if (rows.exists(_.status == "ERROR")) throw new Args.CliExit(2)
    } finally spark.stop()
  }
}
