package graft.cli

import graft.operators.Dsir
import org.apache.spark.sql.SparkSession

/**
 * DSIR selection CLI — fit the hashed-bigram importance model
 * ([[graft.operators.Dsir]]) on a corpus with one `source` value as
 * the target domain, and print (or write) the top-k most target-like
 * documents with their micro-integer importance weights. The "give me
 * the slice of the pool that reads like my target domain" tool, run
 * before a sampling pass. Flag discipline follows the reference's
 * `--key value` tools (`CopyRow.java:45-98`).
 */
object DsirMain {

  val Usage: String =
    """usage: graft.cli.DsirMain --corpus <parquet dir> --target <source value>
      |         [--topK <n>] [--buckets <n>] [--out <parquet dir>]""".stripMargin

  val Known = Set("corpus", "target", "topK", "buckets", "out")

  def run(spark: SparkSession, args: Array[String]): Seq[(Long, String, Long)] = {
    val p = Args.parse(args, Known, Usage)
    val corpusDir = p.required("corpus", Usage)
    val target = p.required("target", Usage)
    val topK = p.get("topK").map(_.toInt).getOrElse(100)
    val buckets = p.get("buckets").map(_.toInt).getOrElse(Dsir.DefaultBuckets)
    if (topK <= 0) Args.die("--topK must be positive", Usage)
    if (buckets <= 0) Args.die("--buckets must be positive", Usage)
    val docs = spark.read.parquet(corpusDir)
    Seq("doc_id", "source", "text").filterNot(docs.columns.contains) match {
      case Nil =>
      case m => Args.die(s"corpus is missing columns: ${m.mkString(", ")}", Usage)
    }
    if (docs.filter(docs("source") === target).isEmpty)
      Args.die(s"no documents have source '$target'", Usage)
    val model = Dsir.fit(docs, target, buckets)
    val selected = Dsir.selectTopK(docs, model, topK)
    p.get("out").foreach(selected.write.mode("overwrite").parquet(_))
    val rows = selected.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // doc_id \t source \t dsir_micro — TSV diagnostics
    rows.foreach { case (id, src, w) => println(s"$id\t$src\t$w") }
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
