package graft.operators

import graft.model.CellTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * MOB (medium-object) storage — HBase's `IS_MOB`/`MOB_THRESHOLD` column-
 * family mode for the cell store: cells whose value meets the threshold are
 * stored once in a content-addressed side table, and the main store keeps a
 * small reference cell. HBase does this so region flushes/compactions stop
 * rewriting megabyte values (write amplification) and the memstore/cache
 * stay dense; the same pressure exists here — the multimodal tier carries
 * opaque image/audio bytes in `value` ([[Multimodal]]), and a major
 * compaction ([[Compaction]]) of a blob-heavy store would rewrite every
 * blob on every pass.
 *
 * Layout under `dir`:
 *  - `dir/main` — an ordinary region-layout cell store; blob cells carry
 *    `cellType = "MobRef"` and a `mob:<xxhash64>:<len>` value. Every
 *    visibility/compaction fold in the engine treats non-"Delete" types as
 *    Puts, so refs flow through delete masking, TTL, and version retention
 *    untouched — MOB composes with the whole mutate surface for free.
 *  - `dir/mob` — parquet of (mob_key, mob_len, value), content-addressed
 *    by (xxhash64, length) and deduplicated: N rows referencing the same
 *    blob store its bytes ONCE (HBase dedups per flush; content addressing
 *    dedups globally).
 *
 * Scale shape: the main store stays bytes-small, so scans that never
 * decode `value` (key scans, counts, qualifier filters, grouped-aggregate
 * pushdown) read no blob pages at all; [[readResolved]] joins ONLY the ref
 * cells against the side table on the content key — blob bytes cross the
 * network once, and never for queries that drop them. Compacting the main
 * store ([[compactMain]]) leaves `dir/mob` byte-identical (asserted in
 * MobStoreSpec) — the write-amplification win MOB exists for.
 */
object MobStore {

  /** The ref-cell type. Not "Delete", so every visibility fold keeps it. */
  val RefType = "MobRef"

  private def refValue = concat(
    lit("mob:"), hex(xxhash64(col("value"))), lit(":"),
    length(col("value")).cast("string")).cast("binary")

  /** The blob predicate for a threshold. */
  def isBlob(threshold: Int): org.apache.spark.sql.Column =
    col("cellType") === "Put" && length(col("value")) >= threshold

  /** Blob cells → their small MobRef twins. */
  private[graft] def refCells(blobs: DataFrame): DataFrame =
    blobs.select(
      col("rowKey"), col("family"), col("qualifier"), col("ts"),
      lit(RefType).as("cellType"),
      refValue.as("value"))

  /** Blob cells → deduplicated content-addressed side-table rows. */
  private[graft] def blobEntries(blobs: DataFrame): DataFrame =
    blobs.select(
        xxhash64(col("value")).as("mob_key"),
        length(col("value")).cast("long").as("mob_len"),
        col("value"))
      .dropDuplicates("mob_key", "mob_len")

  /** Split `cells` at `threshold` value bytes and persist both sides. */
  def writeMob(cells: DataFrame, dir: String, threshold: Int,
      numRegions: Int = 8): Unit = {
    require(threshold > 0, "mob threshold must be positive")
    val blobs = cells.filter(isBlob(threshold))
    blobEntries(blobs)
      .repartition(numRegions, col("mob_key"))
      .write.mode("overwrite").parquet(s"$dir/mob")
    val main = cells.filter(!isBlob(threshold)).unionByName(refCells(blobs))
    CellTable.writeRegionLayout(main, s"$dir/main", numRegions)
  }

  /** The main store as written — refs visible as refs (cheap scans). */
  def readMain(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("cellstore").load(s"$dir/main")

  /** The store with every ref resolved back to its blob bytes — the
    * transparent-read view. Only ref cells join the side table; plain
    * cells pass through untouched. */
  def readResolved(spark: SparkSession, dir: String): DataFrame = {
    val main = readMain(spark, dir)
    val plain = main.filter(col("cellType") =!= RefType)
    val parts = split(col("value").cast("string"), ":")
    val refs = main.filter(col("cellType") === RefType)
      // keyToLong, not conv(..,16,10): xxhash64 spans the full signed
      // 64-bit range and a one-shot unsigned conv overflows BIGINT → NULL
      .withColumn("mob_key",
        CellTable.keyToLong(unhex(lpad(element_at(parts, 2), 16, "0"))))
      .withColumn("mob_len", element_at(parts, 3).cast("long"))
    val mob = spark.read.parquet(s"$dir/mob")
      .withColumnRenamed("value", "_blob")
    refs.join(mob, Seq("mob_key", "mob_len"))
      .select(
        col("rowKey"), col("family"), col("qualifier"), col("ts"),
        lit("Put").as("cellType"), col("_blob").as("value"))
      .unionByName(plain)
  }

  /** Major-compact the MAIN store only; `dir/mob` is never rewritten. */
  def compactMain(spark: SparkSession, dir: String, maxVersions: Int = 1,
      ttlWatermark: Long = Long.MinValue, numRegions: Int = 8): Unit =
    Compaction.compactStore(spark, s"$dir/main", maxVersions, ttlWatermark, numRegions)

  /** Drop side-table blobs no main-store ref can reach — the MOB garbage
    * collection HBase runs as mob compaction, and the step that makes a
    * subject purge REAL for blob bytes: after the purged rows' ref cells
    * are masked and compacted away ([[Governance]] → [[compactMain]]),
    * their blobs are orphans, and this pass physically removes them.
    *
    * Liveness = the content keys referenced by any VISIBLE ref cell
    * (delete-masked latest read, so a ref masked by a purge marker is
    * already dead even before the main compaction). The live-key set is
    * ref-count-sized (two BIGINTs per distinct blob) — the blob bytes are
    * only read to be rewritten, once, into the surviving side table.
    *
    * Returns (blobs kept, blobs dropped). */
  def reclaimMob(spark: SparkSession, dir: String, numRegions: Int = 8): (Long, Long) = {
    val parts = split(col("value").cast("string"), ":")
    // visibility folds over ALL cells (markers must mask their refs), the
    // ref filter applies to the surviving latest versions
    val live = CellTable.visibleLatest(readMain(spark, dir))
      .filter(col("cellType") === RefType)
      .select(
        CellTable.keyToLong(unhex(lpad(element_at(parts, 2), 16, "0"))).as("mob_key"),
        element_at(parts, 3).cast("long").as("mob_len"))
      .distinct()
    val mob = spark.read.parquet(s"$dir/mob")
    val total = mob.count()
    val survivors = mob.join(live, Seq("mob_key", "mob_len"), "left_semi")
    // stage-then-swap: never read and overwrite the same files in one job
    val staged = s"$dir/mob_reclaim_staging"
    survivors.repartition(numRegions, col("mob_key"))
      .write.mode("overwrite").parquet(staged)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/mob"), true)
    fs.rename(new org.apache.hadoop.fs.Path(staged),
      new org.apache.hadoop.fs.Path(s"$dir/mob"))
    val kept = spark.read.parquet(s"$dir/mob").count()
    (kept, total - kept)
  }

  /** Storage accounting: per family, ref cells vs distinct blobs vs plain
    * cells — the dedup and bytes-kept-out-of-the-main-store evidence. */
  def mobStats(spark: SparkSession, dir: String): DataFrame = {
    val main = readMain(spark, dir)
    val perFamily = main.groupBy("family").agg(
      count(when(col("cellType") === RefType, 1)).as("n_refs"),
      count(when(col("cellType") =!= RefType, 1)).as("n_plain"),
      sum(length(col("value")).cast("long")).as("main_bytes"))
    val mob = spark.read.parquet(s"$dir/mob").agg(
      count(lit(1)).as("n_blobs"),
      sum(col("mob_len")).as("blob_bytes"))
    perFamily.crossJoin(mob) // mob agg is one row
  }
}
