package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}

import graft.sources.CellStoreSource

/**
 * Point-in-time snapshot/export of a cell store — the HBase
 * snapshot/ExportSnapshot analogue for the columnar store (the reference
 * toolkit operates on live tables; an engine that OWNS its store needs an
 * export path for backup and offline analysis).
 *
 * Committed store files are immutable (the writer renames job-unique names
 * in; rewrites produce NEW names and delete old ones), so a snapshot is
 * simply the file list at a moment in time: pin the list, copy those files
 * plus the salt manifest. Appends landing mid-copy are invisible to the
 * snapshot (their names are not in the pinned list). If an incremental
 * compaction deletes a pinned file before it is copied, the copy fails
 * loudly rather than exporting a hole — rerun the export (or schedule
 * exports and compactions off each other, as HBase does).
 */
object StoreSnapshot {

  /** Copy the store at `path` to `dest` as of now; returns the exported
    * file names. `dest` must not already contain a store. */
  def export(path: String, dest: String): Seq[String] = {
    val conf = new Configuration()
    val src = new Path(path)
    val dst = new Path(dest)
    val sfs = src.getFileSystem(conf)
    val dfs = dst.getFileSystem(conf)
    require(sfs.exists(src), s"no store at $path")
    require(!dfs.exists(dst) || dfs.listStatus(dst).isEmpty,
      s"snapshot destination $dest is not empty")
    dfs.mkdirs(dst)
    val pinned = sfs.listStatus(src)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") && s.getLen > 0)
      .map(_.getPath.getName).sorted.toSeq
    // side metadata travels with the data files (absent entries are fine:
    // a store without a salt manifest is a range store, one without bloom
    // sidecars just loses point-GET file elision)
    val withMeta = pinned ++
      graft.sources.CellBloom.sidecarsOf(src, conf, pinned) ++
      Seq(CellStoreSource.MetaFile).filter(n => sfs.exists(new Path(src, n)))
    withMeta.foreach { name =>
      if (!FileUtil.copy(sfs, new Path(src, name), dfs, new Path(dst, name),
          false, false, conf))
        throw new java.io.IOException(
          s"snapshot export: copy of $name from $path to $dest failed")
    }
    pinned
  }
}
