package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
 * of two bounded rank lists — typically a lexical leg (BM25 through the
 * inverted-index store) and a semantic leg (embedding-cosine top-k).
 *
 * Fusion is computed on INTEGER "RRF points": a rank `r` in a leg is
 * worth `floor(1e12 / (K + r))` points (K = 60, the constant the RRF
 * paper fixes), and a document's fused score is the sum of its points
 * across legs. The floor-of-one-correctly-rounded-division form is
 * bit-identical across engines (exactly representable operands, one
 * IEEE division, one exact floor), so the fused ORDER — not just the
 * set — replays in the DuckDB differential oracle. A document missing
 * from a leg simply contributes no points (its rank is reported as 0).
 *
 * 100 TB shape: both input legs are top-k lists — k rows each by
 * construction, regardless of corpus size (the legs' own cost is the
 * index probe / ANN scan, measured separately). The fusion itself is a
 * full-outer join of two ≤k-row frames followed by a rank window over
 * ≤2k rows — constant work, independent of data scale.
 */
object HybridSearch {

  /** Integer RRF point scale: floor(1e12 / (K + rank)). 1e12 keeps ~8
    * significant digits of separation between adjacent ranks. */
  val RrfScale = 1000000000000L

  /** The RRF paper's smoothing constant. */
  val DefaultRrfK = 60

  /** Points for one leg's rank (rank >= 1); 0-rank (absent) gets 0.
    * Spark's floor(double) is LongType already — cast pins it. */
  private def points(rank: Column, rrfK: Int): Column =
    when(rank > 0,
      floor(lit(RrfScale.toDouble) / (lit(rrfK.toDouble) + rank.cast("double")))
        .cast("bigint"))
      .otherwise(lit(0L))

  /**
   * Fuse two rank lists into the RRF top-k. Inputs need `doc_id` and
   * `rank` (1-based BIGINT, as [[InvertedIndex.searchBm25]] and
   * [[Similarity.bruteForceTopK]] emit); ties in the fused score break
   * by ascending doc_id, mirroring every ranked query in the pack.
   *
   * Output: doc_id, lex_rank, sem_rank (0 = not retrieved by that
   * leg), rrf_score (integer points), rank — atomic-typed throughout.
   */
  def fuseTopK(lexical: DataFrame, semantic: DataFrame, k: Int,
      rrfK: Int = DefaultRrfK): DataFrame = {
    val l = lexical.select(col("doc_id"), col("rank").as("lex_rank"))
    val s = semantic.select(col("doc_id"), col("rank").as("sem_rank"))
    val fused = l.join(s, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).cast("bigint").as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).cast("bigint").as("sem_rank"))
      .withColumn("rrf_score",
        (points(col("lex_rank"), rrfK) + points(col("sem_rank"), rrfK))
          .cast("bigint"))
    val top = fused.orderBy(col("rrf_score").desc, col("doc_id").asc).limit(k)
    // rank over the k collected rows only — bounded input, safe window
    top.withColumn("rank",
      row_number()
        .over(Window.orderBy(col("rrf_score").desc, col("doc_id").asc))
        .cast("bigint"))
  }
}
