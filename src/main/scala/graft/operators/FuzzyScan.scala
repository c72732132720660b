package graft.operators

import graft.functions.FuzzyKeyMatch
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * FuzzyRowFilter scan — the HBase fixed-position row-key wildcard filter
 * (a list of `(pattern, mask)` pairs, rows matching ANY pair survive),
 * re-expressed so Catalyst and the DSv2 source each do the part they are
 * good at:
 *
 *  - the *fixed prefix* of each mask (its leading run of fixed bytes)
 *    becomes a rowKey byte-range `[prefix, successor(prefix))`; the OR of
 *    those ranges is a plain range-predicate disjunction the cell store
 *    already prunes files and row groups with
 *    ([[graft.sources.CellStoreSource.boundsSetOf]], the
 *    MultiRowRangeFilter machinery) — the analogue of FuzzyRowFilter's
 *    SEEK_NEXT_USING_HINT jumps, done at storage granularity;
 *  - the exact fixed-position semantics stay in
 *    [[graft.functions.FuzzyKeyMatch]], a codegen'd residual evaluated on
 *    the rows the pruned scan still yields.
 *
 * The two parts are emitted as a TOP-LEVEL conjunction
 * `(range₁ OR range₂ …) AND (match₁ OR match₂ …)`: Spark splits top-level
 * conjuncts before source pushdown, so the pure-range disjunct translates
 * to `sources.Or` bounds and prunes, while an `Or(And(range, match), …)`
 * shape would fail filter translation entirely (every Or branch must
 * translate) and lose all pruning. The conjunction is semantics-preserving:
 * each fuzzy match implies its own prefix range, so the OR of matches
 * implies the OR of ranges.
 *
 * At 100 TB the prefix ranges are what keep this from being a full scan:
 * a mask whose leading bytes are fixed (the common "salt/tenant/date fixed,
 * id wildcarded" shape) touches only the regions of that prefix; a mask
 * with no fixed prefix degrades — honestly and visibly — to a full scan
 * with a codegen'd per-row check, exactly like the HBase filter does when
 * its first mask byte is a wildcard.
 */
object FuzzyScan {

  /** Leading run of fixed (mask==0) bytes — the pruning-usable prefix. */
  private[graft] def fixedPrefixLen(mask: Array[Byte]): Int = {
    var i = 0
    while (i < mask.length && mask(i) == 0) i += 1
    i
  }

  /** Smallest byte string strictly greater than every key with `prefix` —
    * increment the last non-0xFF byte and truncate (HBase's
    * `calculateTheClosestNextRowKeyForPrefix`); None = the all-0xFF prefix
    * has no upper bound. */
  private[graft] def prefixSuccessor(prefix: Array[Byte]): Option[Array[Byte]] = {
    var i = prefix.length - 1
    while (i >= 0 && prefix(i) == -1) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(prefix, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  /** The `(ranges) AND (matches)` predicate over `key` for the pair list. */
  def fuzzyFilter(key: Column, pairs: Seq[(Array[Byte], Array[Byte])]): Column = {
    require(pairs.nonEmpty, "fuzzy scan needs at least one (pattern, mask) pair")
    pairs.foreach { case (p, m) =>
      require(p.length == m.length,
        s"fuzzy pattern (${p.length}) and mask (${m.length}) must align") }
    val ranges = pairs.map { case (p, m) =>
      val n = fixedPrefixLen(m)
      if (n == 0) lit(true) // no fixed prefix: this pair cannot prune
      else {
        val lo = java.util.Arrays.copyOf(p, n)
        prefixSuccessor(lo) match {
          case Some(hi) => key >= lit(lo) && key < lit(hi)
          case None     => key >= lit(lo)
        }
      }
    }.reduce(_ || _)
    val matches = pairs.map { case (p, m) =>
      Shims.column(FuzzyKeyMatch(Shims.expression(key), p, m))
    }.reduce(_ || _)
    ranges && matches
  }

  /** Filter a cell store (or any frame with a BINARY `rowKey`) fuzzily. */
  def fuzzyRowScan(store: DataFrame, pairs: Seq[(Array[Byte], Array[Byte])]): DataFrame =
    store.filter(fuzzyFilter(col("rowKey"), pairs))
}
