package graft.cli

import graft.operators.InvertedIndex
import org.apache.spark.sql.SparkSession

/**
 * Keyword-search CLI over a persisted inverted-index cell store — the
 * retrieval tier behind the reference's `--key value` tool surface
 * (`CopyRow.java:45-98` flag discipline): build an index once with
 * `--build` from a parquet corpus, then serve ranked queries from it.
 *
 * Search cost is the probed terms' posting buckets (pushed GETs with
 * bucket pruning + bloom elision), never a corpus scan — the CLI is a
 * thin shell over [[InvertedIndex.search]]/[[InvertedIndex.searchBm25]].
 */
object SearchMain {

  val Usage: String =
    """usage: graft.cli.SearchMain --indexDir <dir> --terms <t1,t2,...>
      |         [--mode tfidf|bm25|phrase] [--k <n>]
      |         [--build <corpus parquet> [--idCol doc_id] [--textCol text]]
      |       (--mode phrase treats --terms as the exact token sequence;
      |        score column = match count)""".stripMargin

  val Known = Set("indexDir", "terms", "mode", "k", "build", "idCol", "textCol")

  final case class Hit(doc_id: Long, score: Long, rank: Long)

  def run(spark: SparkSession, args: Array[String]): Seq[Hit] = {
    val p = Args.parse(args, Known, Usage)
    val indexDir = p.required("indexDir", Usage)
    val terms = p.required("terms", Usage).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (terms.isEmpty) Args.die("--terms must name at least one term", Usage)
    val mode = p.get("mode").getOrElse("tfidf")
    if (mode != "tfidf" && mode != "bm25" && mode != "phrase")
      Args.die(s"unknown --mode '$mode' (tfidf|bm25|phrase)", Usage)
    val k = p.long("k", default = 10L).toInt

    p.get("build").foreach { corpus =>
      InvertedIndex.buildIndex(spark, spark.read.parquet(corpus), indexDir,
        idCol = p.get("idCol").getOrElse("doc_id"),
        textCol = p.get("textCol").getOrElse("text"))
    }

    val ranked = mode match {
      case "bm25" => InvertedIndex.searchBm25(spark, indexDir, terms, k)
      case "phrase" => InvertedIndex.searchPhrase(spark, indexDir, terms, k)
        .withColumnRenamed("n_matches", "score")
      case _ => InvertedIndex.search(spark, indexDir, terms, k)
    }
    val hits = ranked.collect().map(r => Hit(
      r.getAs[Long]("doc_id"), r.getAs[Long]("score"), r.getAs[Long]("rank"))).toSeq
    // rank \t doc_id \t score (micro-units) — TSV like the reference's sinks
    hits.foreach(h => println(s"${h.rank}\t${h.doc_id}\t${h.score}"))
    hits
  }

  def main(args: Array[String]): Unit = Args.runMain {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      // UTC pin keeps the engine-wide invariant Tables.normalizeEventTs
      // relies on, uniform across every entry point (Verify/Bench/
      // CorpusCleanMain already pin it) — a future events-consuming CLI
      // copied from this template must not be host-timezone-dependent
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, args) finally spark.stop()
  }
}
