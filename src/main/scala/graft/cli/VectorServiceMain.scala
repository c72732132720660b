package graft.cli

import graft.operators.{IvfIndex, ModelStore}
import graft.streaming.{StreamAnnServe, VectorIngest, VectorService}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Vector-service operations CLI — the lifecycle the library verifies
 * (q_vector_service / q_service_policy) made OPERABLE from flags (the
 * reference's D2 tool-bootstrap shape, `CopyRow.java:59-98`'s flag
 * discipline, applied to the vector tier): build the index, stream new
 * vectors in, serve query batches, read the drift/policy status,
 * rebuild.
 *
 * The model artifact persists next to the index
 * ([[ModelStore.saveIvfModel]] — float-bit exact, so the fingerprint
 * survives the round-trip): separate CLI invocations cannot share
 * driver memory, so every action re-loads the artifact and the layout
 * stamp rejects a stale one loudly — the coordination contract across
 * PROCESSES, enforced the same way it is across streams. `ingest` and
 * `serve` drain with AvailableNow (one batch sweep per invocation;
 * checkpoints make re-invocations resume, slice addressing makes
 * replays no-ops).
 *
 * Exit contract: `status` exits 0 whether or not the policy fires —
 * the REBUILD=true|false line is the signal (the IndexDoctorMain
 * convention: automation gates on the line, not the exit code).
 */
object VectorServiceMain {

  val Usage: String =
    """usage: graft.cli.VectorServiceMain --action build|ingest|serve|status|rebuild
      |         --indexDir <dir> --modelDir <dir>
      |         [--input <parquet dir>]  vectors (build/ingest) or queries (serve)
      |         [--out <dir>]            served-answer root (serve)
      |         [--checkpoint <dir>]     stream checkpoint (ingest/serve)
      |         [--nlist <n>] [--iters <n>] [--recallTarget <0..1>]  build/rebuild
      |         [--k <n>] [--nprobe <n>]             serve
      |         [--maxSkew <ratio>] [--targetCell <n>]  status""".stripMargin

  val Known = Set("action", "indexDir", "modelDir", "input", "out",
    "checkpoint", "nlist", "iters", "k", "nprobe", "maxSkew", "targetCell",
    "recallTarget")

  /** Measure the probe curve over the just-written layout (first 5
    * vectors by id as the tuning queries — the pack convention), take
    * the bounded autotuned decision at the per-index recall target, and
    * ship it WITH the model artifact: a later `serve` process defaults
    * to the measured probe instead of the heuristic (the "no unmeasured
    * serving probe" doctrine, across processes). Paid once at
    * build/rebuild — the exact baseline is the same one-off cost the
    * pack curve pays. */
  private def measureAndSaveServing(spark: SparkSession, indexDir: String,
      modelDir: String, m: IvfIndex.Model, corpus: org.apache.spark.sql.DataFrame,
      targetMicro: Long): Int = {
    val queries = corpus.orderBy("vec_id").limit(5)
    val curve = IvfIndex.probeCurve(spark, indexDir, corpus, queries, m, k = 20)
    val np = IvfIndex.servingDecision(curve, m.nlist, targetMicro)
    ModelStore.saveServingProbe(spark, np, targetMicro, modelDir)
    np
  }

  def run(spark: SparkSession, args: Array[String]): Map[String, String] = {
    val p = Args.parse(args, Known, Usage)
    val action = p.required("action", Usage)
    val indexDir = p.required("indexDir", Usage)
    val modelDir = p.required("modelDir", Usage)
    def input = p.required("input", Usage)
    def checkpoint = p.required("checkpoint", Usage)

    val kvs: Seq[(String, String)] = action match {
      case "build" =>
        val corpus = spark.read.parquet(input).select("vec_id", "embedding")
        val n = corpus.count()
        val nlist = p.long("nlist", IvfIndex.scaledNlist(n).toLong).toInt
        val m = IvfIndex.train(corpus, nlist, p.long("iters", 3L).toInt)
        IvfIndex.writeIndex(corpus, m, indexDir)
        ModelStore.saveIvfModel(spark, m, modelDir)
        val target = math.floor(
          p.get("recallTarget").map(_.toDouble).getOrElse(0.9) * 1000000.0)
          .toLong
        val np = measureAndSaveServing(spark, indexDir, modelDir, m, corpus,
          target)
        Seq("N_VECTORS" -> n.toString, "NLIST" -> nlist.toString,
          "SERVING_NPROBE" -> np.toString,
          "FINGERPRINT" -> m.fingerprint)

      case "ingest" =>
        val m = ModelStore.loadIvfModel(spark, modelDir)
        val delta = spark.readStream
          .schema(spark.read.parquet(input).schema).parquet(input)
        val q = VectorIngest.start(delta, m, indexDir, checkpoint,
          trigger = Trigger.AvailableNow())
        try q.awaitTermination() finally q.stop()
        val total = IvfIndex.cellStats(spark, indexDir)
          .agg(sum(col("n_vectors"))).head().getLong(0)
        Seq("N_TOTAL" -> total.toString)

      case "serve" =>
        val m = ModelStore.loadIvfModel(spark, modelDir)
        val outDir = p.required("out", Usage)
        val queries = spark.readStream
          .schema(spark.read.parquet(input).schema).parquet(input)
        // probe precedence: explicit flag > the artifact's MEASURED
        // decision (shipped by build/rebuild) > the √nlist heuristic
        // (legacy artifacts without a serving row)
        val nprobe = p.get("nprobe").map(_.toInt)
          .orElse(ModelStore.loadServingProbe(spark, modelDir))
          .getOrElse(IvfIndex.scaledNprobe(m.nlist))
        val q = StreamAnnServe.start(queries, m, indexDir, outDir,
          checkpoint, k = p.long("k", 10L).toInt, nprobe = nprobe,
          trigger = Trigger.AvailableNow())
        try q.awaitTermination() finally q.stop()
        Seq("N_ANSWERS" ->
          StreamAnnServe.results(spark, outDir).count().toString)

      case "status" =>
        // footer metadata only — no data pages, no Spark job (cellStats)
        val counts = IvfIndex.cellStats(spark, indexDir)
          .withColumnRenamed("n_vectors", "n")
        val maxSkewMicro = math.floor(
          p.get("maxSkew").map(_.toDouble).getOrElse(2.0) * 1000000.0).toLong
        val r = VectorService.rebuildPolicyFromCounts(counts, indexDir,
          maxSkewMicro, p.long("targetCell", 256L)).head()
        Seq(
          "N_CELLS" -> r.getAs[Long]("n_cells").toString,
          "N_TOTAL" -> r.getAs[Long]("n_total").toString,
          "MEAN_MICRO" -> r.getAs[Long]("mean_micro").toString,
          "SKEW_MICRO" -> r.getAs[Long]("skew_micro").toString,
          "SKEW_EXCEEDED" -> r.getAs[Boolean]("skew_exceeded").toString,
          "OCCUPANCY_EXCEEDED" ->
            r.getAs[Boolean]("occupancy_exceeded").toString,
          "REBUILD" -> r.getAs[Boolean]("rebuild").toString,
          "NEXT_NLIST" -> r.getAs[Long]("next_nlist").toString)

      case "rebuild" =>
        val total = IvfIndex.cellStats(spark, indexDir)
          .agg(sum(col("n_vectors"))).head().getLong(0)
        val nlist = p.long("nlist", IvfIndex.scaledNlist(total).toLong).toInt
        val m2 = IvfIndex.rebuildIndex(spark, indexDir, nlist,
          p.long("iters", 3L).toInt)
        ModelStore.saveIvfModel(spark, m2, modelDir)
        // the layout changed → the old measured decision is stale;
        // re-measure over the rebuilt layout and re-ship it
        val target = math.floor(
          p.get("recallTarget").map(_.toDouble).getOrElse(0.9) * 1000000.0)
          .toLong
        val np = measureAndSaveServing(spark, indexDir, modelDir, m2,
          IvfIndex.readIndex(spark, indexDir).select("vec_id", "embedding"),
          target)
        Seq("NLIST" -> nlist.toString,
          "SERVING_NPROBE" -> np.toString,
          "FINGERPRINT" -> m2.fingerprint,
          "REBUILT" -> "true")

      case other => Args.die(s"unknown action: $other", Usage)
    }
    kvs.foreach { case (k, v) => println(s"$k=$v") }
    kvs.toMap
  }

  def main(args: Array[String]): Unit = Args.runMain {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      // UTC pin: the engine-wide invariant every entry point shares
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try { run(spark, args); () } finally spark.stop()
  }
}
