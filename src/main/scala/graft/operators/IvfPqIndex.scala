package graft.operators

import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF × PQ composed ANN (the IVFADC scheme of Jégou et al., TPAMI'11 §IV):
 * the corpus is coarse-quantized into `nlist` IVF cells and PQ-encoded, and
 * a query ADC-scans only its `nprobe` closest cells — IVF prunes WHICH data
 * is read, PQ compresses WHAT is read. This closes the 100 TB ANN story:
 * flat ADC ([[PqIndex.searchAdc]]) still sweeps every code (~3 TB at 100 TB
 * corpus even 32×-compressed); composed, a probe touches nprobe/nlist of
 * the codes, and dynamic partition pruning skips the rest at scan time.
 *
 * Design choices vs the paper:
 *  - Codes are global-PQ over the L2-normalized vectors, not per-cell
 *    residual-PQ. Residuals buy in-cell quantization accuracy at the cost
 *    of per-cell codebook bookkeeping; with the exact rerank stage on top,
 *    both only affect CANDIDATE recall, and global codes keep the encode a
 *    single narrow projection reusable across layouts.
 *  - The index layout is one parquet partition directory per cell holding
 *    only (vec_id, codes) — 8 B of codes per vector at m=8. Rerank reads
 *    the float vectors for just the r candidates per query via an equi-join
 *    back to the corpus table.
 *
 * Scale shape: driver state is centroids (nlist×dim floats) + codebooks
 * (m×k×subDim floats) — kilobytes, broadcast as plan literals. The probe
 * join is a broadcast of (query × nprobe) rows against the cell-partitioned
 * code scan; nothing driver-side grows with the corpus.
 */
object IvfPqIndex {

  /** Coarse quantizer + product codebooks, trained on the same corpus. */
  final case class Model(coarse: IvfIndex.Model, pq: PqIndex.Codebooks)

  /** Train both stages (each deterministic — seeds are the first vectors
    * by id, see [[IvfIndex.train]] / [[PqIndex.train]]). */
  def train(corpus: DataFrame, nlist: Int, dim: Int = 64, m: Int = 8,
      k: Int = 16, coarseIters: Int = 3, pqIters: Int = 3): Model =
    Model(
      IvfIndex.train(corpus, nlist, coarseIters),
      PqIndex.train(corpus, dim, m, k, pqIters))

  /** Persist the index: PQ codes partitioned by IVF cell (`cell=<i>/`).
    * A probe of `nprobe` cells reads nprobe/nlist of the CODES — the float
    * vectors are not in the index at all. */
  def writeIndex(corpus: DataFrame, model: Model, path: String): Unit =
    IvfIndex.assign(corpus, model.coarse)
      // normalized vector materialized in its OWN projection: the m×k
      // codeword scorings below reference it, and `transform` (no codegen)
      // re-evaluates inlined subexpressions per reference (same trap as
      // PqIndex.encode / TextAnalysis.repetitionStats)
      .select(col("vec_id"), col("cell"), PqIndex.normed(col("embedding")).as("_e"))
      .select(col("vec_id"), col("cell"),
        PqIndex.codesColumn(model.pq, col("_e")).as("codes"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /**
   * Cell-pruned ADC + exact rerank over a persisted index. Per query: the
   * `nprobe` closest cells are probed (equi-join on `cell` against the
   * broadcast query side → dynamic partition pruning skips every other
   * cell directory), candidates are ADC-scored from codes alone, the top
   * `r` are re-scored exactly from the corpus floats, and the top `k` win.
   */
  def searchIndex(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, model: Model, k: Int, nprobe: Int, r: Int): DataFrame = {
    require(r >= k, "rerank pool must be at least k")
    val encoded = spark.read.parquet(path) // (vec_id, codes, cell)

    // probe cells score on the RAW embedding (ranking is norm-invariant);
    // ADC tables need the normalized query — both in named projections
    val q = queries
      .select(col("vec_id").as("query_id"),
        PqIndex.normed(col("embedding")).as("_e"),
        IvfIndex.probeCellsColumn(model.coarse, col("embedding"), nprobe).as("_pc"))
      .select(col("query_id"),
        PqIndex.adcTablesColumn(model.pq, col("_e")).as("tables"),
        col("_pc"))
      .select(col("query_id"), col("tables"), explode(col("_pc")).as("probe"))
      .select(col("query_id"), col("tables"), col("probe.cell").as("cell"))

    val scored = encoded.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        // quantized before ranking so the candidate cut is ulp-robust
        // cross-engine (see Similarity.q9)
        round(PqIndex.adcScore(col("codes"), col("tables")), 9).as("adc_score"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc_score").desc, col("vec_id").asc)
    val cands = scored.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= r)
      .select("query_id", "vec_id")

    val emb = corpus.select(col("vec_id"), col("embedding"))
    val qemb = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("query_vec"))
    val exact = cands.join(emb, "vec_id").join(broadcast(qemb), "query_id")
      .select(col("query_id"), col("vec_id"),
        round(VectorFunctions.cosine_sim(col("embedding"), col("query_vec")), 9)
          .as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    exact.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }

  /** Models memoized per corpus (train once, search many — the production
    * shape; both stages are deterministic so cached ≡ fresh). */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Model]()

  /** The one cached model of this session, if any — lets SparkEntry emit
    * the composed oracle SQL from the exact centroids + codebooks the query
    * used (Verify runs queries first, then collects oracleSql). */
  def cachedModel: Option[Model] = {
    val vs = modelCache.values()
    if (vs.size() == 1) Some(vs.iterator().next()) else None
  }

  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Query-pack adapter: train (or reuse) the composed model, persist the
    * cell-partitioned code layout (once), search the first 5 vectors with
    * nprobe=2 of 8 cells, ADC pool r=50, exact top-10. */
  def ivfpqQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val model = modelCache.computeIfAbsent(s"$sfDir#nlist=8#m=8#k=16",
      _ => train(emb, nlist = 8, dim = 64, m = 8, k = 16,
        coarseIters = 2, pqIters = 2))
    val dir = indexCache.computeIfAbsent(sfDir, _ => {
      val d = graft.WorkDirs.dir(s"ivfpq_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}")
      writeIndex(emb, model, d)
      d
    })
    searchIndex(spark, dir, emb, emb.filter(col("vec_id") < 5), model,
      k = 10, nprobe = 2, r = 50)
  }
}
