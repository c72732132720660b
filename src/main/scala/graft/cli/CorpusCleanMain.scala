package graft.cli

import graft.operators.CorpusPipeline
import org.apache.spark.sql.SparkSession

/**
 * CLI for the corpus-cleaning pipeline — the D2 bootstrap pattern
 * (`MRUtil.java:24-41` job wiring) applied to the engine's extension tier:
 * parquet in, cleaned parquet out, with the same knobs the library exposes
 * (quality floor, language allowlist, near-dup threshold, optional
 * repetition gate, optional eval-set decontamination).
 */
object CorpusCleanMain {

  val Usage: String =
    """usage: graft.cli.CorpusCleanMain --input <parquet dir> --output <dir>
      |         [--minQuality <0..1>] [--langs en,es,...]
      |         [--nearDupThreshold <0..1>] [--maxTopFrac <0..1>]
      |         [--maxDupFrac <0..1>] [--evalSet <parquet dir>]
      |         [--decontamN <tokens>] [--materialize true|false]""".stripMargin

  val Known = Set("input", "output", "minQuality", "langs", "nearDupThreshold",
    "maxTopFrac", "maxDupFrac", "evalSet", "decontamN", "materialize")

  /** Parse + run; returns the cleaned-row count (tests observe it). */
  def run(spark: SparkSession, args: Array[String]): Long = {
    val p = Args.parse(args, Known, Usage)
    val input = p.required("input", Usage)
    val output = p.required("output", Usage)
    val cfg = CorpusPipeline.Config(
      minQuality = p.get("minQuality").map(_.toDouble).getOrElse(0.5),
      keepLangs = p.get("langs").map(_.split(",").toSeq)
        .getOrElse(CorpusPipeline.Config().keepLangs),
      nearDupThreshold = p.get("nearDupThreshold").map(_.toDouble).getOrElse(0.8),
      maxDupFrac = p.get("maxDupFrac").map(_.toDouble),
      maxTopFrac = p.get("maxTopFrac").map(_.toDouble),
      decontamN = p.get("decontamN").map(_.toInt).getOrElse(13))

    val docs = spark.read.parquet(input)
    // stage checkpoints between clean/decontam — the operational default
    // for a batch job (each stage computes once); declarative opt-out for
    // plan inspection
    val mat = p.get("materialize").forall(_.toBoolean)
    val cleaned = p.get("evalSet") match {
      case Some(evalDir) =>
        CorpusPipeline.cleanWithEval(docs, spark.read.parquet(evalDir), cfg,
          materialize = mat)
      case None => CorpusPipeline.clean(docs, cfg, materialize = mat)
    }
    cleaned.write.mode("overwrite").parquet(output)
    spark.read.parquet(output).count()
  }

  def main(args: Array[String]): Unit = Args.runMain {
    val spark = SparkSession.builder()
      .appName("graft-corpus-clean")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val n = run(spark, args)
      println(s"CLEANED_ROWS=$n")
    } finally spark.stop()
  }
}
