package graft.cli

import graft.operators.CopyRow
import graft.sources.Catalog
import org.apache.spark.sql.SparkSession

/**
 * CLI twin of the reference's CopyRow tool (`CopyRow.java`), same flag
 * surface: copy one row's cells between cell tables, optionally bumping
 * every cell's timestamp. Tables are `ns:table` identifiers resolved by
 * [[Catalog]]; source and destination may be the same table
 * (`README.md:26` behavior — append, never overwrite).
 *
 * Deviations from the reference, per SURVEY.md §7.4: the write batches by
 * partition (vs one Put RPC per cell) and failures exit non-zero (the
 * reference logs and exits 0, `CopyRow.java:145-147`).
 */
object CopyRowMain {

  val Usage: String =
    """usage: graft.cli.CopyRowMain --sourceTable <ns:table> --destTable <ns:table>
      |         --rowKeyByteString <key as printed by HBase shell>
      |         [--override true|false] [--timestampToUse <epochMillis>]""".stripMargin

  val Known = Set("sourceTable", "destTable", "rowKeyByteString", "override", "timestampToUse")

  def run(spark: SparkSession, args: Array[String]): Long = {
    val p = Args.parse(args, Known, Usage)
    val source = p.required("sourceTable", Usage)
    val dest = p.required("destTable", Usage)
    val key = p.required("rowKeyByteString", Usage)
    val overrideTs = p.bool("override", default = false)
    val tsToUse = p.long("timestampToUse", default = System.currentTimeMillis())

    if (!Catalog.exists(spark, source))
      Args.die(s"source table '$source' does not exist", Usage)

    val cells = Catalog.load(spark, source)
    val copied = CopyRow.run(cells, key, overrideTs, tsToUse)(
      out => Catalog.save(out, dest))
    println(s"copied $copied cells of row '$key' from $source to $dest" +
      (if (overrideTs) s" with ts=$tsToUse" else ""))
    copied
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
