package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex

/**
 * Search-index freshness under streaming ingest — the retrieval leg of
 * the freshness trilogy ([[StreamStats]] for ANALYZE statistics,
 * [[StreamRollup]] for materialized aggregates, this for the inverted
 * index): new documents become searchable without rebuilding the index
 * or rescanning history.
 *
 * Layout (the StreamRollup delta discipline): the index ROOT holds one
 * complete per-slice index store per delta — `root/delta=base` for the
 * initial corpus, `root/delta=b<batchId>` per micro-batch. Every index
 * artifact is a per-slice PARTIAL that merges by union + sum, because
 * each document lives in exactly one slice:
 *
 *  - postings (tf, dl): per (term, doc) — slices are disjoint, union;
 *  - df: #docs containing the term — sums across slices;
 *  - meta n_docs / sum_dl: corpus totals — sum across slices.
 *
 * [[searchAll]] probes each delta with the same pushed-GET path as the
 * single-store search and merges the probed triples before the
 * identical scoring tail — so ranked results over base+stream EQUAL a
 * from-scratch index of the full corpus, exactly (spec-pinned).
 * Replayed batches overwrite their own delta dir (idempotent);
 * [[compact]] folds the delta stores into a new base by merging the
 * artifacts themselves — no access to the original documents needed.
 *
 * 100 TB shape: a micro-batch indexes only its own documents; search
 * cost grows by one bounded probe per delta (compaction bounds the
 * count); nothing ever rescans or re-indexes history.
 */
object StreamIndex {

  private def deltaDirs(root: String): Seq[String] = {
    val fs = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty)
    fs.filter(f => f.isDirectory && f.getName.startsWith("delta="))
      .map(_.getAbsolutePath).sorted.toSeq
  }

  /** Index the initial corpus into `root/delta=base`. */
  def initialize(spark: SparkSession, docs: DataFrame, root: String,
      buckets: Int = 8): Unit =
    InvertedIndex.buildIndex(spark, docs, s"$root/delta=base", buckets)

  /** Index one micro-batch into its own replay-safe delta store. */
  def appendBatch(batch: DataFrame, batchId: Long, root: String,
      buckets: Int = 8): Unit =
    InvertedIndex.buildIndex(batch.sparkSession, batch,
      s"$root/delta=b$batchId", buckets)

  /** Wire a document stream into the index root via foreachBatch. */
  def start(stream: DataFrame, root: String, checkpoint: String,
      buckets: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => appendBatch(b, id, root, buckets))
      .start()

  /** Ranked tf·idf search over base + all streamed deltas: one pushed
    * probe per delta, merged triple, the single-store scoring tail. */
  def searchAll(spark: SparkSession, root: String, terms: Seq[String],
      k: Int): DataFrame = {
    val uniq = terms.distinct
    val probes = deltaDirs(root).map(d =>
      InvertedIndex.probeStore(spark, d, uniq))
    require(probes.nonEmpty, s"no delta stores under $root")
    val post = probes.map(_._1).reduce(_ unionByName _)
    val dfs = probes.map(_._2).reduce(_ unionByName _)
      .groupBy("term").agg(sum(col("df")).as("df"))
    val nDocs = probes.map(_._3).sum
    InvertedIndex.scoreTfidf(post, dfs, nDocs, k)
  }

  /** Fold all delta stores into a fresh base: postings cells are
    * disjoint (concatenate), df cells sum per term, metas sum — every
    * merge input is read from the stores, never from the documents.
    * Single-writer contract (one streaming query per index root), as
    * [[StreamRollup.compact]]. */
  def compact(spark: SparkSession, root: String, buckets: Int = 8): Unit = {
    val dirs = deltaDirs(root)
    val cells = dirs.map(d =>
      spark.read.format("cellstore").load(d)
        .select(col("rowKey"), col("family"), col("qualifier"),
          col("ts"), col("cellType"), col("value")))
      .reduce(_ unionByName _)
    val plain = cells.filter(col("family") === "post" || col("family") === "pos")
    val summed = cells
      .filter(col("family") === "df" || col("family") === "meta")
      .groupBy(col("rowKey"), col("family"), col("qualifier"),
        col("ts"), col("cellType"))
      .agg(graft.model.CellTable.bigEndianKey(
        sum(graft.model.CellTable.keyToLong(col("value")))).as("value"))
      .select(col("rowKey"), col("family"), col("qualifier"),
        col("ts"), col("cellType"), col("value"))
    val merged = plain.unionByName(summed).localCheckpoint()
    val staged = s"$root/delta=compacting"
    merged.write.format("cellstore").option("buckets", buckets.toString)
      .mode("overwrite").save(staged)
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(del)
      f.delete(); ()
    }
    dirs.foreach(d => del(new java.io.File(d)))
    val ok = new java.io.File(staged)
      .renameTo(new java.io.File(s"$root/delta=base"))
    require(ok, s"rename of compacted index failed under $root")
  }
}
