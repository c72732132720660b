package graft.sources

import java.util.Base64

import graft.functions.{MinHashImpl, SimHashImpl}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/**
 * Per-file rowKey Bloom filters for the cell store — the HFile-bloom
 * analogue (HBase's `BLOOMFILTER => 'ROW'`): a point GET whose key is
 * INSIDE a file's [min, max] range but absent from the file can skip the
 * file without opening it. Range stats can't serve that case; blooms can.
 *
 * Mechanics:
 *  - each write task folds its rowKeys into a fixed 128 Kbit / 7-hash
 *    filter (~1% false positives up to ~13 k distinct keys per file —
 *    region files are key-partitioned, so per-file cardinality is bounded
 *    by layout, not corpus) and ships it in the commit message;
 *  - the driver persists them in `_cellstore_blooms.json` at commit,
 *    keyed by file name — append merges, truncate resets, file-scoped
 *    rewrites drop superseded entries;
 *  - scan planning consults the filter ONLY for pushed/runtime exact keys
 *    (GET / IN); a file with no entry is "may contain" — blooms are pure
 *    IO elision, never a correctness dependency, and the residual filter
 *    re-checks every row anyway. A lost concurrent update degrades to the
 *    no-entry case.
 *
 * Hashing: Kirsch–Mitzenmacher double hashing over (fnv1a64, mix64|1) of
 * the key bytes — the same public-construction kernels the dedup tier
 * uses, one byte-scan per key.
 */
object CellBloom {

  val BloomFile = "_cellstore_blooms.json"
  val NumBits: Int = 1 << 17
  val NumWords: Int = NumBits / 64
  val NumHashes: Int = 7

  def empty(): Array[Long] = new Array[Long](NumWords)

  @inline private def bitOf(h: Long): Int = ((h & Long.MaxValue) % NumBits).toInt

  def add(bits: Array[Long], key: Array[Byte]): Unit = {
    val h1 = SimHashImpl.fnv1a64(key)
    val h2 = MinHashImpl.mix64(h1) | 1L
    var h = h1
    var i = 0
    while (i < NumHashes) {
      h += h2
      val b = bitOf(h)
      bits(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
  }

  def mayContain(bits: Array[Long], key: Array[Byte]): Boolean = {
    val h1 = SimHashImpl.fnv1a64(key)
    val h2 = MinHashImpl.mix64(h1) | 1L
    var h = h1
    var i = 0
    while (i < NumHashes) {
      h += h2
      val b = bitOf(h)
      if ((bits(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  private def encode(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    Base64.getEncoder.encodeToString(bb.array())
  }

  private def decode(s: String): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(Base64.getDecoder.decode(s))
    Array.fill(bb.remaining() / 8)(bb.getLong())
  }

  /** All recorded blooms of a store (empty map if none). */
  private[graft] def read(dir: Path, conf: Configuration): Map[String, Array[Long]] = {
    val fs = dir.getFileSystem(conf)
    val p = new Path(dir, BloomFile)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    """"([^"]+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> decode(m.group(2))).toMap
  }

  private def write(dir: Path, conf: Configuration, m: Map[String, Array[Long]]): Unit = {
    val fs = dir.getFileSystem(conf)
    val body = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + encode(v) + "\"" }
      .mkString("{", ",", "}")
    val out = fs.create(new Path(dir, BloomFile), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Commit-time update: start from the recorded map (or nothing, on
    * truncate), drop superseded entries, add the new files'. */
  private[sources] def update(
      dir: Path, conf: Configuration,
      added: Map[String, Array[Long]],
      removed: Set[String],
      reset: Boolean): Unit = {
    val base = if (reset) Map.empty[String, Array[Long]] else read(dir, conf)
    write(dir, conf, (base -- removed) ++ added)
  }
}
