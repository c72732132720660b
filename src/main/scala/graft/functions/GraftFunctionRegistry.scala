package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.Shims

/**
 * Single definition of the engine's SQL-callable function surface.
 *
 * Every custom Catalyst expression in `graft.functions` is exposed under
 * one name table so the two registration paths can't drift:
 *
 *  - [[GraftFunctionRegistry.registerAll]] — session-scoped temp functions,
 *    for code that already holds a `SparkSession` (the `SparkEntry.queries`
 *    harness, notebooks);
 *  - [[graft.GraftExtensions]] — `spark.sql.extensions` injection, for
 *    pure-SQL users (spark-sql shell, Thrift server, JDBC) who never touch
 *    the Scala API. The reference ships its tools as classpath-invoked
 *    mains (`CopyRow.java:34` `ToolRunner`); the Spark-native analogue of
 *    "usable without writing code" is a SQL surface registered at session
 *    build time.
 *
 * Fixed integer parameters (shingle width, lane count) must be foldable
 * integer literals — they parameterize codegen, not per-row data.
 */
object GraftFunctionRegistry {

  private def checkArity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$fn expects $n argument(s), got ${args.length}")

  /** Evaluate a foldable integer argument (e.g. `shingle_hashes(tk, 3)`). */
  private def intArg(fn: String, e: Expression, pos: Int): Int = e match {
    case lit: Literal if lit.value != null => lit.value match {
      case i: Int   => i
      case l: Long  => math.toIntExact(l)
      case s: Short => s.toInt
      case b: Byte  => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument $pos must be an integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a foldable integer literal")
  }

  /** Evaluate a foldable BINARY argument (e.g. `fuzzy_key_match(k, unhex(..), unhex(..))`). */
  private def binArg(fn: String, e: Expression, pos: Int): Array[Byte] =
    if (e.foldable && e.dataType == org.apache.spark.sql.types.BinaryType)
      e.eval() match {
        case b: Array[Byte] => b
        case _ => throw new IllegalArgumentException(
          s"$fn: argument $pos must be a non-null BINARY literal")
      }
    else throw new IllegalArgumentException(
      s"$fn: argument $pos must be a foldable BINARY literal")

  /** (name, implementing class, usage, builder) — one row per SQL function. */
  val all: Seq[(String, Class[_], String, Seq[Expression] => Expression)] = Seq(
    ("to_string_binary", classOf[ToStringBinary],
      "to_string_binary(bytes) - renders BINARY in the \\xHH dialect",
      es => { checkArity("to_string_binary", es, 1); ToStringBinary(es.head) }),
    ("to_bytes_binary", classOf[ToBytesBinary],
      "to_bytes_binary(str) - parses the \\xHH dialect back to BINARY",
      es => { checkArity("to_bytes_binary", es, 1); ToBytesBinary(es.head) }),
    ("shingle_hashes", classOf[ShingleHashes],
      "shingle_hashes(tokens, n) - sorted distinct 64-bit hashes of n-token windows",
      es => { checkArity("shingle_hashes", es, 2)
              ShingleHashes(es.head, intArg("shingle_hashes", es(1), 2)) }),
    ("minhash", classOf[MinHashFromHashes],
      "minhash(hashes, k) - k-lane MinHash signature from a shingle-hash array",
      es => { checkArity("minhash", es, 2)
              MinHashFromHashes(es.head, intArg("minhash", es(1), 2)) }),
    ("sorted_intersect_count", classOf[SortedIntersectCount],
      "sorted_intersect_count(a, b) - |A intersect B| over ascending BIGINT arrays",
      es => { checkArity("sorted_intersect_count", es, 2)
              SortedIntersectCount(es.head, es(1)) }),
    ("simhash64", classOf[SimHash64],
      "simhash64(tokens) - 64-bit SimHash over a token array",
      es => { checkArity("simhash64", es, 1); SimHash64(es.head) }),
    ("cosine_sim", classOf[CosineSim],
      "cosine_sim(a, b) - cosine similarity over FLOAT arrays",
      es => { checkArity("cosine_sim", es, 2); CosineSim(es.head, es(1)) }),
    ("dot_product", classOf[DotProduct],
      "dot_product(a, b) - dot product over FLOAT arrays",
      es => { checkArity("dot_product", es, 2); DotProduct(es.head, es(1)) }),
    ("zvalue", classOf[InterleaveBits],
      "zvalue(a, b) - Morton code of two BIGINT dimensions (Z-order clustering key)",
      es => { checkArity("zvalue", es, 2); InterleaveBits(es.head, es(1)) }),
    ("hvalue", classOf[HilbertIndex],
      "hvalue(a, b) - Hilbert index of two BIGINT dimensions (continuous clustering key)",
      es => { checkArity("hvalue", es, 2); HilbertIndex(es.head, es(1)) }),
    ("rep_stats", classOf[RepStats],
      "rep_stats(text, n) - (nw, nd, top) repetition counts of n-token windows",
      es => { checkArity("rep_stats", es, 2)
              RepStats(es.head, intArg("rep_stats", es(1), 2)) }),
    ("normalize_text", classOf[NormalizeText],
      "normalize_text(s) - NFC + control strip + whitespace collapse",
      es => { checkArity("normalize_text", es, 1); NormalizeText(es.head) }),
    ("hlc_margin", classOf[HashedLinearMargin],
      "hlc_margin(text, dim) - hashed-linear classifier margin over dim buckets",
      es => { checkArity("hlc_margin", es, 2)
              HashedLinearMargin(es.head, intArg("hlc_margin", es(1), 2)) }),
    ("fuzzy_key_match", classOf[FuzzyKeyMatch],
      "fuzzy_key_match(key, pattern, mask) - HBase FuzzyRowFilter byte match (mask 0 = fixed)",
      es => { checkArity("fuzzy_key_match", es, 3)
              FuzzyKeyMatch(es.head,
                binArg("fuzzy_key_match", es(1), 2),
                binArg("fuzzy_key_match", es(2), 3)) }))

  /** Register every function as a session-scoped temp function. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, _, builder) =>
      Shims.registerFunction(spark, name, builder)
    }

  /** Inject every function into a session being built (extensions path). */
  def inject(extensions: SparkSessionExtensions): Unit =
    all.foreach { case (name, cls, usage, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, null, name, usage, ""),
        builder))
    }
}
