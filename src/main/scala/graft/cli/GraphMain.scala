package graft.cli

import graft.operators.LinkRank
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Link-graph CLI — collapse an event log to its transition graph and
 * print one of the graph artifacts ([[graft.operators.LinkRank]]):
 * `rank` (integer-unit PageRank), `communities` (deterministic label
 * propagation), or `next` (the top-3 next-item serving table). The
 * "what does the navigation graph say about my items" tool. Flag
 * discipline follows the reference's `--key value` tools
 * (`CopyRow.java:45-98`).
 */
object GraphMain {

  val Usage: String =
    """usage: graft.cli.GraphMain --events <parquet dir> --mode rank|communities|next
      |         [--iters <n>] [--rounds <n>] [--out <parquet dir>]""".stripMargin

  val Known = Set("events", "mode", "iters", "rounds", "out")

  def run(spark: SparkSession, args: Array[String]): Seq[String] = {
    val p = Args.parse(args, Known, Usage)
    val eventsDir = p.required("events", Usage)
    val mode = p.required("mode", Usage)
    def intFlag(name: String, default: Int): Int =
      p.get(name).map(v => scala.util.Try(v.toInt).getOrElse(
        Args.die(s"--$name must be an integer, got '$v'", Usage))).getOrElse(default)
    val iters = intFlag("iters", 5)
    val rounds = intFlag("rounds", 3)
    if (iters <= 0) Args.die("--iters must be positive", Usage)
    if (rounds <= 0) Args.die("--rounds must be positive", Usage)
    val events = spark.read.parquet(eventsDir)
    Seq("event_id", "ts", "user_id", "props").filterNot(events.columns.contains) match {
      case Nil =>
      case m => Args.die(s"events are missing columns: ${m.mkString(", ")}", Usage)
    }
    // the aggregated edge table is the one event-log pass every mode
    // shares — pinned so the guard, the mode plan, --out, and the
    // TSV collect never rescan events
    val edges = LinkRank.transitions(events).localCheckpoint()
    if (edges.isEmpty) Args.die("no transitions in the event log", Usage)
    val result = (mode match {
      case "rank" =>
        LinkRank.pageRank(edges, iters)
          .orderBy(col("rank").desc, col("node").asc)
      case "communities" =>
        LinkRank.labelPropagation(edges, rounds)
          .orderBy(col("label").asc, col("node").asc)
      case "next" =>
        LinkRank.nextItemsFromEdges(edges)
          .orderBy(col("k").asc, col("rank").asc)
      case other => Args.die(s"unknown --mode '$other'", Usage)
    }).localCheckpoint() // one computation serves both the write and the TSV
    p.get("out").foreach(result.write.mode("overwrite").parquet(_))
    val lines = result.collect().map(_.toSeq.mkString("\t")).toSeq
    lines.foreach(println)
    lines
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
