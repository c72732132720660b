package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Persistence for the engine's learned artifacts — BPE merge tables and
 * PCA models — as plain parquet under a model directory: train once on
 * the cluster, ship the artifact, load it anywhere (including a job that
 * never sees the training corpus). The IVF/PQ index stores already
 * persist themselves through the cell-store writer; this covers the two
 * driver-resident models the same way, with the schemas kept trivially
 * inspectable (`merges`: rank/lhs/rhs/count rows; `pca`: tagged
 * (kind, component, dim, value) rows).
 *
 * Writes go through a temp-dir rename via the normal parquet committer
 * (job-level atomicity on a local/HDFS-like FS, same guarantee every
 * other store in the engine relies on).
 */
object ModelStore {

  def saveBpeMerges(spark: SparkSession, merges: Seq[BpeTrainer.Merge],
      path: String): Unit = {
    import spark.implicits._
    merges.toDF().write.mode("overwrite").parquet(s"$path/merges")
  }

  def loadBpeMerges(spark: SparkSession, path: String): Seq[BpeTrainer.Merge] = {
    spark.read.parquet(s"$path/merges")
      .orderBy("rank").collect()
      .map(r => BpeTrainer.Merge(r.getAs[Int]("rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("count")))
      .toSeq
  }

  def savePcaModel(spark: SparkSession, m: EmbeddingPca.Model, path: String): Unit = {
    import spark.implicits._
    val d = m.mean.length
    val rows =
      m.mean.zipWithIndex.map { case (v, i) => ("mean", -1, i, v) } ++
      m.eigenvalues.zipWithIndex.map { case (v, k) => ("eigenvalue", k, -1, v) } ++
      (for (k <- m.components.indices; i <- 0 until d)
        yield ("component", k, i, m.components(k)(i))) ++
      Seq(("trace", -1, -1, m.covTrace))
    rows.toSeq.toDF("kind", "component", "dim", "value")
      .write.mode("overwrite").parquet(s"$path/pca")
  }

  /** IVF coarse-quantizer persistence, (cell, dim, value) float rows —
    * FLOAT-BIT EXACT through parquet's float32 physical type, so the
    * loaded model's fingerprint equals the saved one's and the layout
    * stamp ([[IvfIndex.requireModelMatches]]) survives the round-trip:
    * this is what lets separate CLI PROCESSES share one index safely —
    * every invocation re-loads the artifact, and a stale artifact fails
    * the stamp loudly exactly like a stale in-memory model. */
  def saveIvfModel(spark: SparkSession, m: IvfIndex.Model, path: String): Unit = {
    import spark.implicits._
    val rows = for (c <- m.centroids.indices; d <- m.centroids(c).indices)
      yield (c, d, m.centroids(c)(d))
    rows.toDF("cell", "dim", "value")
      .write.mode("overwrite").parquet(s"$path/ivf")
  }

  def loadIvfModel(spark: SparkSession, path: String): IvfIndex.Model = {
    val rows = spark.read.parquet(s"$path/ivf").collect()
    val byCell = rows.groupBy(_.getAs[Int]("cell")).toSeq.sortBy(_._1)
    IvfIndex.Model(byCell.map { case (_, rs) =>
      rs.sortBy(_.getAs[Int]("dim")).map(_.getAs[Float]("value")).toSeq
    })
  }

  /** The index's MEASURED serving decision persisted next to its model
    * — (nprobe, target) one-row parquet: a fresh CLI process cannot
    * re-derive the curve it never measured, so the build/rebuild that
    * DID measure it ships the decision with the artifact and `serve`
    * defaults to it (the engine-wide "no unmeasured serving probe"
    * doctrine, across processes). */
  def saveServingProbe(spark: SparkSession, nprobe: Int, targetMicro: Long,
      path: String): Unit = {
    import spark.implicits._
    Seq((nprobe, targetMicro)).toDF("nprobe", "target_micro")
      .write.mode("overwrite").parquet(s"$path/serving")
  }

  def loadServingProbe(spark: SparkSession, path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/serving")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(p.toString).head().getAs[Int]("nprobe"))
  }

  def loadPcaModel(spark: SparkSession, path: String): EmbeddingPca.Model = {
    val rows = spark.read.parquet(s"$path/pca").collect()
    def of(kind: String) = rows.filter(_.getAs[String]("kind") == kind)
    val mean = of("mean").sortBy(_.getAs[Int]("dim"))
      .map(_.getAs[Double]("value"))
    val evals = of("eigenvalue").sortBy(_.getAs[Int]("component"))
      .map(_.getAs[Double]("value"))
    val d = mean.length
    val comps = of("component")
      .groupBy(_.getAs[Int]("component")).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        val arr = new Array[Double](d)
        rs.foreach(r => arr(r.getAs[Int]("dim")) = r.getAs[Double]("value"))
        arr
      }.toArray
    val trace = of("trace").head.getAs[Double]("value")
    EmbeddingPca.Model(mean, evals, comps, trace)
  }
}
