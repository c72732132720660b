package graft.streaming

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/**
 * Point-in-time snapshot/export for DELTA ROOTS — the DR story for the
 * vector service's index and served-answer roots
 * ([[graft.operators.StoreSnapshot]] covers cell stores; until round 18
 * the index tier had no backup path at all).
 *
 * The layout makes this the same manifest-chain design: committed
 * slices are IMMUTABLE (a slice lands with one rename and is only ever
 * DELETED — by a fold's GC — never rewritten), so a snapshot is the
 * recursive file list of the LIVE slice set at a moment in time,
 * recorded as root-relative paths. Everything inside a slice travels —
 * parquet cell files AND the `_model.fp` stamp — so a restored index
 * passes [[graft.operators.IvfIndex.requireModelMatches]] exactly like
 * the original.
 *
 * Incremental chains (HBase ExportSnapshot's skip-existing discipline):
 * a later snapshot physically copies only files the prior chain does
 * not already hold at the same relative path + length, and records in
 * its manifest where every logical file lives. At 100 TB the nightly
 * export ships the day's new slices, never the corpus. A fold REPLACES
 * slices with a new base generation, so post-fold snapshots naturally
 * re-ship the folded base — chain incrementality is per slice
 * generation, exactly matching the layout's immutability unit.
 *
 * Concurrency: slices landing mid-copy are invisible (pinned list); a
 * fold's GC deleting a pinned file mid-copy fails the export loudly —
 * rerun it, or schedule exports off the compaction cadence (the
 * StoreSnapshot convention). Quarantined dirs are NOT part of a
 * snapshot: they are race evidence pending operator re-ingest, not
 * live data.
 *
 * [[restore]] walks one manifest and materializes a complete working
 * root, re-checking each holder file's length so a tampered or
 * garbage-collected holder fails the restore instead of silently
 * restoring a hole.
 */
object DeltaSnapshot {

  /** Per-snapshot catalog: one `relPath<TAB>length<TAB>holderDir` line
    * per logical file of the live slice set. */
  val ManifestFile = "SNAPSHOT_MANIFEST"

  /** The snapshot's logical file list as (relPath, length, holder). */
  def manifest(spark: SparkSession, snapshotDir: String): Seq[(String, Long, String)] =
    DeltaLayout.readMarker(spark, s"$snapshotDir/$ManifestFile")
      .getOrElse(throw new IllegalStateException(
        s"no $ManifestFile under $snapshotDir"))
      .split("\n").filter(_.nonEmpty).toSeq.map { line =>
        val Array(n, l, h) = line.split("\t", 3)
        (n, l.toLong, h)
      }

  /** Root-relative paths + lengths of every file in the live slice set
    * (the pinned moment-in-time list). */
  private def liveFiles(spark: SparkSession, root: String): Seq[(String, Long)] = {
    val fs = DeltaLayout.fileSystem(spark, root)
    val rootPath = new Path(root)
    def walk(p: Path): Seq[(String, Long)] = {
      val st = fs.listStatus(p)
      st.filter(_.isFile).map { f =>
        val rel = f.getPath.toString.stripPrefix(
          fs.makeQualified(rootPath).toString).stripPrefix("/")
        (rel, f.getLen)
      }.toSeq ++ st.filter(_.isDirectory).flatMap(d => walk(d.getPath))
    }
    DeltaLayout.liveDirs(spark, root)
      .flatMap(d => walk(new Path(d)))
      .sortBy(_._1)
  }

  /** Copy the live slice set of `root` to `dest` as of now. `dest` must
    * be empty. Returns the exported relative paths. */
  def export(spark: SparkSession, root: String, dest: String): Seq[String] =
    exportIncremental(spark, root, dest, Nil)

  /** Snapshot `root` into `dest`, physically copying ONLY files absent
    * from the `prior` snapshot chain (oldest → newest; a relPath+length
    * hit in a LATER snapshot wins). Every logical file — copied or
    * inherited — lands in `dest`'s manifest, so a restore needs only
    * this snapshot. Returns the relative paths physically copied. */
  def exportIncremental(spark: SparkSession, root: String, dest: String,
      prior: Seq[String]): Seq[String] = {
    val fs = DeltaLayout.fileSystem(spark, root)
    val src = new Path(root)
    val dst = new Path(dest)
    require(fs.exists(src), s"no delta root at $root")
    require(!fs.exists(dst) || fs.listStatus(dst).isEmpty,
      s"snapshot destination $dest is not empty")
    fs.mkdirs(dst)
    val held = scala.collection.mutable.Map[(String, Long), String]()
    prior.foreach(p => manifest(spark, p).foreach { case (n, l, h) =>
      held((n, l)) = h })
    val pinned = liveFiles(spark, root)
    val conf = spark.sessionState.newHadoopConf()
    val entries = pinned.map { case (rel, len) =>
      (rel, len, held.get((rel, len)))
    }
    val copied = entries.collect { case (rel, _, None) =>
      if (!FileUtil.copy(fs, new Path(src, rel), fs, new Path(dst, rel),
          false, false, conf))
        throw new java.io.IOException(
          s"delta snapshot: copy of $rel from $root to $dest failed")
      rel
    }
    val lines = entries.map { case (rel, len, holder) =>
      s"$rel\t$len\t${holder.getOrElse(dest)}"
    }
    DeltaLayout.writeMarker(spark, s"$dest/$ManifestFile",
      lines.mkString("\n") + "\n")
    copied
  }

  /** Materialize a complete working delta root at `dest` from one
    * snapshot's manifest — every file fetched from its recorded holder,
    * with the recorded length re-checked so a tampered or
    * garbage-collected holder fails the restore instead of silently
    * restoring a hole. The restored root is immediately servable: the
    * live slice set (including each slice's `_model.fp`) is exactly the
    * snapshot moment's. */
  def restore(spark: SparkSession, snapshotDir: String, dest: String): Seq[String] = {
    val fs = DeltaLayout.fileSystem(spark, dest)
    val dst = new Path(dest)
    require(!fs.exists(dst) || fs.listStatus(dst).isEmpty,
      s"restore destination $dest is not empty")
    fs.mkdirs(dst)
    val conf = spark.sessionState.newHadoopConf()
    manifest(spark, snapshotDir).map { case (rel, len, holder) =>
      val srcFile = new Path(holder, rel)
      val hfs = srcFile.getFileSystem(conf)
      require(hfs.exists(srcFile),
        s"restore: $rel missing from holder $holder")
      val actual = hfs.getFileStatus(srcFile).getLen
      require(actual == len,
        s"restore: $rel in $holder has length $actual, manifest says $len")
      if (!FileUtil.copy(hfs, srcFile, fs, new Path(dst, rel), false, false, conf))
        throw new java.io.IOException(s"restore: copy of $rel failed")
      rel
    }
  }
}
