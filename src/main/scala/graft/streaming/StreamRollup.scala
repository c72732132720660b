package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.plans.RollupRewrite

/**
 * Rollup freshness under streaming ingest — the missing half of
 * [[graft.plans.RollupRewrite]]: partial aggregates are MERGEABLE, so a
 * rollup stays correct under appends by adding MORE PARTIAL ROWS, never
 * by rewriting the ones it has.
 *
 * Layout: the rollup root is a partitioned directory of delta slices —
 * `root/delta=base/` holds the initial fact-table partials,
 * `root/delta=b<batchId>/` holds one micro-batch's partials. A scan of
 * the root sees the union of all slices (plus a `delta` string column
 * the re-aggregation ignores), and the serving Aggregate's sum-of-sums
 * / sum-of-counts / min-of-mins regroups them to the same answer a
 * fact-table rescan would give. The rewrite rule re-reads the root at
 * every optimization, so a report picks up new batches with NO
 * invalidation protocol at all.
 *
 * Idempotent replay (the CellStoreIngest / StreamExport commit
 * discipline): each batch writes its own `delta=b<id>` directory in
 * overwrite mode — a crashed-and-replayed micro-batch replaces its own
 * slice byte-for-byte instead of double-counting.
 *
 * 100 TB shape: each micro-batch's partials collapse map-side to at
 * most |group domain| rows before one tiny write; the rollup grows by
 * |group domain| rows per batch (compact occasionally by regrouping
 * the deltas themselves — they are partials too).
 */
object StreamRollup {

  /** Partial-aggregate rows of one fact slice, in the rollup schema
    * [[RollupRewrite.Rollup]] describes: `sums` maps (base column,
    * optional pre-sum cast) → partial name; `count` counts slice rows
    * per group; `mins`/`maxs` carry extrema. */
  def partialRows(
      slice: DataFrame,
      keys: Seq[String],
      sums: Map[(String, Option[DataType]), String],
      count: Option[String],
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty): DataFrame = {
    require(sums.nonEmpty || count.nonEmpty || mins.nonEmpty || maxs.nonEmpty,
      "a rollup needs at least one measure")
    val aggs =
      sums.toSeq.map { case ((c, cast), p) =>
        sum(cast.fold(col(c))(col(c).cast(_))).as(p)
      } ++
      count.map(p => org.apache.spark.sql.functions.count(lit(1)).as(p)) ++
      mins.toSeq.map { case (c, p) => min(col(c)).as(p) } ++
      maxs.toSeq.map { case (c, p) => max(col(c)).as(p) }
    slice.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Write the initial fact-table slice and register the delta root
    * with the rewrite rule. Returns the registered rollup. */
  def initialize(
      fact: DataFrame,
      keys: Seq[String],
      sums: Map[(String, Option[DataType]), String],
      count: Option[String],
      root: String,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty): RollupRewrite.Rollup = {
    partialRows(fact, keys, sums, count, mins, maxs)
      .write.mode("overwrite").parquet(s"$root/delta=base")
    val r = RollupRewrite.Rollup(
      basePaths = RollupRewrite.scanPaths(fact),
      keys = keys, sums = sums, count = count,
      mins = mins, maxs = maxs, rollupPath = root)
    RollupRewrite.register(fact, r)
    RollupRewrite.ensureInjected(fact.sparkSession)
    r
  }

  /** One micro-batch: collapse to partials, overwrite this batch's own
    * delta slice (replay-safe). Use from `foreachBatch`. */
  def appendBatch(
      batch: DataFrame,
      batchId: Long,
      r: RollupRewrite.Rollup): Unit =
    partialRows(batch, r.keys, r.sums, r.count, r.mins, r.maxs)
      .write.mode("overwrite").parquet(s"${r.rollupPath}/delta=b$batchId")

  /** Wire a fact-row stream into the rollup: every micro-batch lands
    * as its own replay-safe delta slice. */
  def start(
      stream: DataFrame,
      r: RollupRewrite.Rollup,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => appendBatch(b, id, r))
      .start()

  /** Compact the delta slices back to one `delta=base` slice: partials
    * re-aggregate to partials (sum of sums, sum of counts, min of
    * mins), so the merged answer is unchanged while the slice count
    * resets — run occasionally when batch deltas accumulate. Writes
    * the compacted slice FIRST, then removes the batch slices, so a
    * crash between the two only leaves re-compactable duplicates...
    * which WOULD double-count; hence the staging dir + atomic rename
    * of the whole root is the production recipe — here the in-JVM
    * single-writer contract (one streaming query per rollup) makes the
    * simple order safe. */
  def compact(spark: SparkSession, r: RollupRewrite.Rollup): Unit = {
    // snapshot the slice set FIRST and fold/delete EXACTLY it: the old
    // re-list-before-delete swept any slice that landed while the
    // compact ran — un-folded, silently (the gcStale race class,
    // rollup flavor). With the snapshot, a concurrent slice simply
    // stays live as a valid partial (merged() re-aggregates partials),
    // so this root needs no abort path at all.
    val root = new org.apache.hadoop.fs.Path(r.rollupPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val slices = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("delta="))
      .map(_.getPath)
    val all = spark.read.option("basePath", r.rollupPath)
      .parquet(slices.map(_.toString): _*)
    val aggs =
      r.sums.values.toSeq.map(p => sum(col(p)).cast(
        all.schema(p).dataType).as(p)) ++
      r.count.map(p => sum(col(p)).cast("bigint").as(p)) ++
      r.mins.values.toSeq.map(p => min(col(p)).as(p)) ++
      r.maxs.values.toSeq.map(p => max(col(p)).as(p))
    val compacted = all.groupBy(r.keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint() // pin BEFORE the overwrite deletes its input
    compacted.write.mode("overwrite").parquet(s"${r.rollupPath}/delta=base")
    // Remove the folded batch slices through Hadoop FileSystem (the
    // slices are written by Hadoop-capable Spark writers, so the root
    // may be hdfs://, s3a://, ... — java.io.File would list null there
    // and silently leave the slices to double-count on the next read)
    // and FAIL on a false delete: FileSystem reports most failures by
    // return value, and an unremoved slice corrupts every merged() /
    // rewrite-rule read from then on.
    slices
      .filter(p => p.getName.startsWith("delta=b") &&
        p.getName != "delta=base") // batch slices only, not the target
      .foreach { p =>
        if (!fs.delete(p, true))
          throw new IllegalStateException(
            s"rollup compact: cannot remove folded slice $p")
      }
  }

  /** The merged serving view (what the rewrite rule's swapped scan
    * reads): all delta slices re-aggregated to one row per group. */
  def merged(spark: SparkSession, r: RollupRewrite.Rollup): DataFrame = {
    val all = spark.read.parquet(r.rollupPath)
    val aggs =
      r.sums.values.toSeq.map(p => sum(col(p)).as(p)) ++
      r.count.map(p => sum(col(p)).as(p)) ++
      r.mins.values.toSeq.map(p => min(col(p)).as(p)) ++
      r.maxs.values.toSeq.map(p => max(col(p)).as(p))
    all.groupBy(r.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
