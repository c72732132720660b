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
 * complete per-slice index store per delta — `root/delta=base` (or a
 * compacted generation `root/delta=base@N`, see below) for the folded
 * corpus, `root/delta=b<batchId>` per micro-batch. Every index
 * artifact is a per-slice PARTIAL that merges by union + sum, because
 * each document lives in exactly one slice:
 *
 *  - postings (tf, dl): per (term, doc) — slices are disjoint, union;
 *  - df: #docs containing the term — sums across slices;
 *  - meta n_docs / sum_dl: corpus totals — sum across slices.
 *
 * [[searchAll]] probes each LIVE delta with the same pushed-GET path as
 * the single-store search and merges the probed triples before the
 * identical scoring tail — so ranked results over base+stream EQUAL a
 * from-scratch index of the full corpus, exactly (spec-pinned).
 * Replayed batches overwrite their own delta dir (idempotent).
 *
 * [[compact]] folds the delta stores into a new base by merging the
 * artifacts themselves — no access to the original documents needed —
 * and commits the fold with ONE rename: the merged store is staged
 * under a name the reader ignores (`compact.staging`), then renamed to
 * `delta=base@<maxFoldedBatchId>`. [[deltaDirs]] selects the
 * highest-generation base plus only the batch slices NEWER than its
 * folded-through id, so the instant the rename lands, readers switch
 * from (old base + folded batches) to (new base) atomically — there is
 * no window where the corpus is partial or double-counted, and a crash
 * at ANY point leaves a correct live set (stale dirs are garbage the
 * next compact sweeps). All listing/renaming/deleting goes through
 * Hadoop [[org.apache.hadoop.fs.FileSystem]] with CHECKED results
 * (rename/delete report failure by returning false), so the root may
 * be hdfs:// or s3a://, not just a local path.
 *
 * 100 TB shape: a micro-batch indexes only its own documents; search
 * cost grows by one bounded probe per delta (compaction bounds the
 * count); nothing ever rescans or re-indexes history.
 */
object StreamIndex {

  /** The LIVE slice set — [[DeltaLayout.liveDirs]]: the newest base
    * generation plus batch slices newer than what it folded; older
    * bases and folded batches are crash garbage [[compact]] sweeps. */
  private[streaming] def deltaDirs(spark: SparkSession, root: String): Seq[String] =
    DeltaLayout.liveDirs(spark, root)

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
    val probes = deltaDirs(spark, root).map(d =>
      InvertedIndex.probeStore(spark, d, uniq))
    require(probes.nonEmpty, s"no delta stores under $root")
    val post = probes.map(_._1).reduce(_ unionByName _)
    val dfs = probes.map(_._2).reduce(_ unionByName _)
      .groupBy("term").agg(sum(col("df")).as("df"))
    val nDocs = probes.map(_._3).sum
    InvertedIndex.scoreTfidf(post, dfs, nDocs, k)
  }

  /** Fold the live delta stores into a fresh base generation: postings
    * cells are disjoint (concatenate), df cells sum per term, metas sum
    * — every merge input is read from the stores, never from the
    * documents. The fold COMMITS with the single `compact.staging` →
    * `delta=base@<maxId>` rename (see the object doc for why that makes
    * every crash point safe). Concurrent-writer-GUARDED since round 17
    * ([[DeltaLayout.guardedCommit]] — the discipline the IVF rebuild
    * earned in round 16, applied here): a slice that lands after the
    * fold read its input aborts the commit loudly pre-rename and is
    * refused GC post-rename — the single-writer contract is enforced,
    * not documented. */
  def compact(spark: SparkSession, root: String, buckets: Int = 8): Unit =
    compactFrom(spark, root, deltaDirs(spark, root), buckets)

  /** [[compact]] from an explicit live-set snapshot — the seam the race
    * specs inject through (a slice landing after the snapshot must end
    * loud, never silently folded or swept). */
  private[graft] def compactFrom(spark: SparkSession, root: String,
      dirs: Seq[String], buckets: Int = 8): Unit =
    DeltaLayout.foldTarget(dirs) match {
      case Some(maxId) =>
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
        // staged under the ignored name; overwrite clears a crashed pass
        merged.write.format("cellstore").option("buckets", buckets.toString)
          .mode("overwrite").save(s"$root/${DeltaLayout.Staging}")
        DeltaLayout.guardedCommit(spark, root, dirs, maxId, "index compact",
          "re-append the raced batches (replay-idempotent), then compact " +
            "again")
      case None => DeltaLayout.gcStale(spark, root)
    }
}
