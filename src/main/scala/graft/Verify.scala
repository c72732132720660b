package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The driver's oracle harness canonicalizes by sorting raw column
    * values in pandas before hashing; MAP/ARRAY/STRUCT cells are
    * unhashable there (round 9's one red row, q_wide_row). Every
    * DECLARED query output column must therefore be atomic — enforced
    * here at dump time and by OperatorSpec at test time.
    *
    * DECIMAL wider than 18 digits is rejected too (round 11's one red
    * row, q_ridge_fit): the driver reads the Spark parquet exactly
    * (python Decimal) but pulls the DuckDB oracle through pandas where
    * wide decimals become float64 and stringify scientifically past 9
    * significant digits — the two paths canonicalize differently the
    * moment a value outgrows the float window. Wide exact integers
    * must ship as digit STRINGS on both sides. */
  def isOracleSortable(dt: DataType): Boolean = dt match {
    case _: MapType | _: ArrayType | _: StructType => false
    case d: DecimalType => d.precision <= 18
    case _ => true
  }

  /** DECIMAL(16..18) passes the TYPE guard but float64 is only exact to
    * 2^53: a 16–18-digit VALUE would still canonicalize differently on
    * the pandas/float64 oracle path. This value-level guard closes that
    * window precisely (a blanket precision≤15 would outlaw the repo's
    * standard DECIMAL(18,4) money sums, whose headroom exists exactly so
    * sf1+ sums cannot ANSI-overflow): any wide-decimal column whose max
    * |value|·10^scale reaches 2^53 fails the dump, not the driver. */
  private val Float64ExactUnits = new java.math.BigDecimal(1L << 53)
  def assertDecimalsInFloatWindow(df: org.apache.spark.sql.DataFrame): Unit = {
    val wide = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[DecimalType] &&
        f.dataType.asInstanceOf[DecimalType].precision > 15 => f.name
    }
    if (wide.nonEmpty) {
      import org.apache.spark.sql.functions.{abs, max, col}
      val maxes = df.agg(max(abs(col(wide.head))),
        wide.tail.map(c => max(abs(col(c)))): _*).head()
      wide.zipWithIndex.foreach { case (name, i) =>
        val m = maxes.getDecimal(i)
        if (m != null &&
            m.movePointRight(m.scale).compareTo(Float64ExactUnits) >= 0)
          throw new IllegalStateException(
            s"column $name: |$m| exceeds the float64-exact window — " +
              "the pandas oracle path would canonicalize it differently; " +
              "ship digit strings or BIGINT instead")
      }
    }
  }
  /** Set for the lifetime of a Verify run (and by DedupSpec's wiring
    * test, which exercises the guarded branch):
    * query adapters whose DuckDB twin carries a data-shape PRECONDITION
    * (e.g. q_simhash_pairs' all-pairs oracle vs the engine's star guard)
    * assert it only when this is on — Bench and production runs, where no
    * oracle compares the output and the guarded shapes are expected,
    * skip the extra pass. */
  @volatile private var oraclePreconditions = false
  def oraclePreconditionsEnabled: Boolean = oraclePreconditions
  private[graft] def enableOraclePreconditions(): Unit =
    oraclePreconditions = true
  /** The matching reset — the flag is process-global, so a TEST that
    * enables it (DedupSpec's wiring check) must restore the default in
    * teardown or every later suite in the same JVM silently runs the
    * precondition path (extra aggregation pass + eager checkpoint):
    * test-order coupling and a plan change outside Verify runs. */
  private[graft] def disableOraclePreconditions(): Unit =
    oraclePreconditions = false

  def main(args: Array[String]): Unit = {
    enableOraclePreconditions()
    // D1-style arg validation (reference CopyRow.java:45-98): usage + exit(1)
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [q1,q2,...]")
      sys.exit(1)
    }
    val (sfDir, outDir) = (args(0), args(1))
    // optional subset for local iteration; the driver passes two args
    val subset: Option[Set[String]] =
      if (args.length == 3) Some(args(2).split(',').toSet) else None
    def wanted(name: String): Boolean = subset.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (wanted(name)) {
        try {
          val df = fn(spark, sfDir)
          val complex = df.schema.fields.filterNot(f => isOracleSortable(f.dataType))
          if (complex.nonEmpty)
            throw new IllegalStateException(
              s"non-atomic output columns (oracle cannot canonicalize): " +
                complex.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          // value guard runs on the WRITTEN parquet (one small-file scan)
          // rather than the live plan — df.agg would execute the whole
          // query a second time. A violation deletes the dump before
          // rethrowing so the driver cannot hash a known-bad artifact.
          try assertDecimalsInFloatWindow(spark.read.parquet(s"$outDir/$name"))
          catch { case e: IllegalStateException =>
            val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
            p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, true)
            throw e
          }
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => wanted(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
