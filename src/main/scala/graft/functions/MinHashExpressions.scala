package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * One-pass shingling + MinHash kernels.
 *
 * The naive composition (`transform(shingles, s => xxhash64(lit(lane), s))`
 * per lane) string-hashes every shingle once PER LANE — 64 lanes ⇒ 64×
 * the hashing work, which dominated the bench (fingerprint/minhash/jaccard
 * ≈ 75 s of a 117 s total at sf0.1). These expressions hash each token once,
 * combine windows with integer mixing, and derive all k lanes from a single
 * 128-bit shingle hash by double hashing (`lane_i = h1 + (i+1)·h2`, the
 * Kirsch–Mitzenmacher construction from the Bloom-filter literature) — the
 * per-lane cost drops from a string hash to one multiply-add.
 */
object MinHashImpl {
  /** 64-bit avalanche finalizer (splitmix64 / murmur3 fmix-style). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /**
   * Distinct, sorted 64-bit hashes of all `n`-token windows. Docs shorter
   * than `n` tokens collapse to one whole-doc window (same fallback as the
   * string shingler). Sorted ascending, so `slice(_, 1, k)` IS the min-k
   * sketch.
   */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val nTok = tokens.numElements()
    val tokenHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      tokenHash(i) =
        if (tokens.isNullAt(i)) 0L
        else SimHashImpl.fnv1a64(tokens.getUTF8String(i).getBytes)
      i += 1
    }
    val windows = if (nTok >= n) nTok - n + 1 else 1
    val width = math.min(n, nTok)
    val set = new java.util.TreeSet[java.lang.Long]()
    var w = 0
    while (w < windows) {
      var h = 0x243f6a8885a308d3L  // arbitrary non-zero seed (pi digits)
      var j = 0
      while (j < width) {
        h = mix64(h ^ tokenHash(w + j)) * 31 + j
        j += 1
      }
      set.add(mix64(h))
      w += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** |A ∩ B| by merge scan over two ascending-sorted long arrays. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /**
   * Per-POSITION two-level xxhash64 window hashes (round 19) — the native
   * form of Dedup.windowOccurrences' interpreted HOF tree: each token is
   * xxhash64'd once (seed 42, the `xxhash64` default), each window folds
   * its n token hashes through xxhash64's multi-argument chaining
   * (`hash = XxHash64(value, prevHash)`), so the produced longs are
   * BIT-IDENTICAL to `xxhash64(element_at(th, i+1), …, element_at(th,
   * i+n))` over `th = transform(lt, t -> xxhash64(t))` (DedupSpec pins
   * this). Unlike [[shingleHashes]], occurrences are NOT deduplicated
   * and positions are preserved — index w is the 0-based window start.
   * Docs shorter than n tokens yield an EMPTY array (the span/substring
   * removers' fallback).
   */
  def windowHashes(tokens: ArrayData, n: Int): ArrayData = {
    val nTok = tokens.numElements()
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      // a null token leaves the seed untouched, exactly like xxhash64(t)
      th(i) =
        if (tokens.isNullAt(i)) 42L
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          tokens.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w < out.length) {
      var h = 42L
      var j = 0
      while (j < n) {
        h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          th(w + j), LongType, h)
        j += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Space-joined n-token gram strings per position, with the whole-doc
   * fallback for docs shorter than n tokens (round 19) — the native form
   * of `transform(sequence(0, size-n), i -> concat_ws(' ', slice(tk,
   * i+1, n)))` (null tokens skipped like concat_ws). Same strings, so a
   * downstream md5 hashes identical bytes.
   */
  def tokenNgrams(tokens: ArrayData, n: Int): ArrayData = {
    val nTok = tokens.numElements()
    val windows = if (nTok >= n) nTok - n + 1 else 1
    val width = math.min(n, nTok)
    val out = new Array[Any](windows)
    var w = 0
    while (w < windows) {
      val sb = new java.lang.StringBuilder
      var first = true
      var j = 0
      while (j < width) {
        if (!tokens.isNullAt(w + j)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(w + j).toString)
          first = false
        }
        j += 1
      }
      out(w) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** k MinHash lanes over a shingle-hash set via double hashing. */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      val h1 = h
      val h2 = mix64(h) | 1L   // odd ⇒ full-period stepping
      var lane = 0
      var v = h1
      while (lane < k) {
        v += h2
        if (v < mins(lane)) mins(lane) = v
        lane += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires ARRAY<STRING> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

case class WindowHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "window width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires ARRAY<STRING> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.windowHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.windowHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_ngrams requires ARRAY<STRING> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.tokenNgrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.tokenNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

case class MinHashFromHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "minhash lane count must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash requires ARRAY<BIGINT> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.minhash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def isLongArray(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashImpl.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MinHashImpl.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object MinHashFunctions {
  /** |A ∩ B| for two ascending-sorted long arrays — linear merge scan, no
    * per-row hash-set allocation (vs. built-in array_intersect). */
  def sorted_intersect_count(a: Column, b: Column): Column =
    Shims.column(SortedIntersectCount(Shims.expression(a), Shims.expression(b)))

  /** Sorted distinct hashes of n-token shingles (ascending ⇒ prefix = min-k). */
  def shingle_hashes(tokens: Column, n: Int): Column =
    Shims.column(ShingleHashes(Shims.expression(tokens), n))

  /** k-lane MinHash signature from a shingle-hash array. */
  def minhash(hashes: Column, k: Int): Column =
    Shims.column(MinHashFromHashes(Shims.expression(hashes), k))

  /** Per-position two-level xxhash64 window hashes (bit-identical to the
    * xxhash64-over-token-hashes expression form; empty for short docs). */
  def window_hashes(tokens: Column, n: Int): Column =
    Shims.column(WindowHashes(Shims.expression(tokens), n))

  /** Per-position space-joined n-gram strings, whole-doc fallback. */
  def token_ngrams(tokens: Column, n: Int): Column =
    Shims.column(TokenNgrams(Shims.expression(tokens), n))
}
