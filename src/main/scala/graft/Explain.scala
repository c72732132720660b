package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of registered
  * queries (`runMain graft.Explain <sfDir> q_a,q_b`) — the explain loop
  * the build process uses to keep plans honest (pushdown present, no
  * stray exchanges, codegen spans wide). */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.Explain <sfDir> <q1,q2,...>")
      sys.exit(1)
    }
    val Array(sfDir, names) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(',').foreach { name =>
      println(s"\n=== $name ===")
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None     => println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
