package graft

import java.nio.file.Files

import graft.functions.ZOrderImpl
import graft.operators.ZOrderLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("interleave is a bijection on a grid and preserves quadrant order") {
    val grid = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val codes = grid.map { case (a, b) => ZOrderImpl.interleave(a, b) }
    assert(codes.distinct.size == grid.size, "Morton code must be injective")
    // whole lower-left quadrant sorts before the whole upper-right quadrant
    val lowMax = (for (a <- 0L until 16L; b <- 0L until 16L)
      yield ZOrderImpl.interleave(a, b)).max
    val highMin = (for (a <- 16L until 32L; b <- 16L until 32L)
      yield ZOrderImpl.interleave(a, b)).min
    assert(lowMax < highMin)
  }

  test("property: interleave round-trips and orders blocks for random 32-bit pairs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val pairGen = for {
      a <- Gen.choose(0L, 0xffffffffL)
      b <- Gen.choose(0L, 0xffffffffL)
    } yield (a, b)
    (0 until 300).foreach { i =>
      val (a, b) = pairGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val z = ZOrderImpl.interleave(a, b)
      // de-interleave: even bits -> a, odd bits -> b (inverse of spread)
      def unspread(x0: Long): Long = {
        var x = x0 & 0x5555555555555555L
        x = (x | (x >> 1)) & 0x3333333333333333L
        x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
        x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
        x = (x | (x >> 8)) & 0x0000ffff0000ffffL
        x = (x | (x >> 16)) & 0x00000000ffffffffL
        x
      }
      val raw = z ^ java.lang.Long.MIN_VALUE
      assert(unspread(raw) == a && unspread(raw >>> 1) == b,
        s"round-trip failed for ($a, $b)")
      // dominance order: strictly smaller in BOTH dims => smaller z
      val (a2, b2) = pairGen.pureApply(Gen.Parameters.default, Seed(100000L + i))
      val (loA, hiA) = (math.min(a, a2), math.max(a, a2))
      val (loB, hiB) = (math.min(b, b2), math.max(b, b2))
      if (loA != hiA && loB != hiB)
        assert(ZOrderImpl.interleave(loA, loB) < ZOrderImpl.interleave(hiA, hiB))
    }
  }

  test("hilbert index is a bijection and CONTINUOUS on a grid") {
    val n = 32
    val byCode = (for (a <- 0L until n; b <- 0L until n)
      yield ZOrderImpl.hilbert(a, b) -> ((a, b))).toMap
    assert(byCode.size == n * n, "Hilbert index must be injective")
    // the defining property Morton lacks: consecutive indexes are
    // spatially ADJACENT cells (Manhattan distance exactly 1)
    val ordered = byCode.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach { case Seq((ax, ay), (bx, by)) =>
      val dist = math.abs(ax - bx) + math.abs(ay - by)
      assert(dist == 1, s"curve jumped from ($ax,$ay) to ($bx,$by)")
    }
  }

  test("hilbert layout: mean per-file bounding-box area at most Morton's") {
    val n = 128
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
    val shuffled = new scala.util.Random(42).shuffle(grid)
    val df = shuffled.toDF("x", "y").repartition(8)

    def meanBoxArea(curve: String): Double = {
      val dir = Files.createTempDirectory(s"graft_curve_$curve").toString
      ZOrderLayout.write(df, "x", "y", dir, numFiles = 16, curve = curve)
      val xs = ZOrderLayout.fileRanges(spark, dir, "x").collect()
        .map(r => r.getAs[String]("file") ->
          (r.getAs[Long]("hi") - r.getAs[Long]("lo") + 1)).toMap
      val ys = ZOrderLayout.fileRanges(spark, dir, "y").collect()
        .map(r => r.getAs[String]("file") ->
          (r.getAs[Long]("hi") - r.getAs[Long]("lo") + 1)).toMap
      val areas = xs.keys.map(f => xs(f).toDouble * ys(f).toDouble)
      areas.sum / areas.size
    }
    val morton = meanBoxArea("morton")
    val hilbert = meanBoxArea("hilbert")
    // continuity ⇒ a contiguous index range never straddles a diagonal
    // seam, so Hilbert files box at most as much area as Morton's
    assert(hilbert <= morton,
      s"hilbert mean box area $hilbert should not exceed morton's $morton")
    // and both stay far below a linear layout's n * n/16 worst case
    assert(hilbert <= 3000, s"hilbert boxes unexpectedly loose: $hilbert")
  }

  test("z-order layout keeps BOTH dimensions tight per file; linear sort only one") {
    val n = 128
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
    val df = scala.util.Random.shuffle(grid).toDF("x", "y").repartition(8)

    val zDir = Files.createTempDirectory("graft_zorder").toString
    val linDir = Files.createTempDirectory("graft_linear").toString
    ZOrderLayout.write(df, "x", "y", zDir, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    def avgWidth(dir: String, c: String): Double = {
      val rows = ZOrderLayout.fileRanges(spark, dir, c).collect()
      rows.map(r => (r.getAs[Long]("hi") - r.getAs[Long]("lo")).toDouble)
        .sum / rows.length
    }
    // 128x128 grid into 16 files: ideal z-order files are 32x32 rectangles;
    // repartitionByRange samples its bounds, so a file can straddle two
    // blocks — allow up to two block widths, still far under the 128 a
    // linear sort spans on the non-leading dimension.
    val zY = avgWidth(zDir, "y"); val zX = avgWidth(zDir, "x")
    val linY = avgWidth(linDir, "y")
    assert(zY <= 72, s"z-order y-width should be ~32-64, got $zY")
    assert(zX <= 72, s"z-order x-width should be ~32-64, got $zX")
    assert(linY >= n - 8, s"linear layout spans y fully, got $linY")

    // semantic sanity: a 2-dim box filter over the layout equals the source
    val box = spark.read.parquet(zDir)
      .filter(col("x").between(10, 20) && col("y").between(100, 120))
    assert(box.count() == 11L * 21L)
    // and BOTH dimensions reach the parquet scan as data filters — the
    // stats pruning the layout exists for needs them at the reader.
    // (PushedFilters renders truncated; DataFilters shows the full list.)
    val plan = box.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(x,10)") &&
      """\(y#\d+L? >= 100\)""".r.findFirstIn(plan).isDefined &&
      """\(y#\d+L? <= 120\)""".r.findFirstIn(plan).isDefined,
      s"expected both box dimensions pushed in:\n$plan")
  }
}
