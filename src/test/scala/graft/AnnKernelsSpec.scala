package graft

import graft.operators.{IvfIndex, PqIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 codegen kernels (graft.functions.AnnKernels) vs the
  * interpreted expression forms they replaced: BIT-equality over the
  * fixture corpus plus the synthetic edges (zero vector, exact score
  * ties). The reference forms are retained in PqIndex / IvfIndex for
  * exactly this pinning — the mmrSelectIterative discipline. */
class AnnKernelsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def emb = graft.sources.Tables.load(spark, sf001, "embeddings")

  // deterministic small models, trained once for the suite
  private lazy val pqModel = PqIndex.train(emb, dim = 64, m = 8, k = 16, iters = 1)
  private lazy val ivfModel = IvfIndex.train(emb, nlist = 8, iters = 1)

  private def assertSame(df: DataFrame): Unit = {
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(!r.getBoolean(0), s"kernel != reference: $r") }
  }

  test("l2_normalize == transform reference (incl. zero vector), bit-exact") {
    val withZero = emb.select(col("embedding"))
      .unionByName(Seq(Tuple1(Array.fill(64)(0f))).toDF("embedding"))
    assertSame(withZero.select(
      (PqIndex.normed(col("embedding")) =!=
        PqIndex.normedReference(col("embedding"))).as("diff")))
  }

  test("pq_encode == nearestCode/array_sort reference, bit-exact") {
    val n = emb.select(col("vec_id"), PqIndex.normed(col("embedding")).as("_e"))
    assertSame(n.select(
      (PqIndex.codesColumn(pqModel, col("_e")) =!=
        PqIndex.codesColumnReference(pqModel, col("_e"))).as("diff")))
  }

  test("adc_tables == dot-literal reference, bit-exact") {
    val n = emb.select(PqIndex.normed(col("embedding")).as("_e"))
    assertSame(n.select(
      (PqIndex.adcTablesColumn(pqModel, col("_e")) =!=
        PqIndex.adcTablesColumnReference(pqModel, col("_e"))).as("diff")))
  }

  test("adc_score == aggregate/zip_with reference, bit-exact") {
    val n = emb.select(col("vec_id"), PqIndex.normed(col("embedding")).as("_e"))
    val coded = n.select(col("vec_id"),
      PqIndex.codesColumn(pqModel, col("_e")).as("codes"),
      PqIndex.adcTablesColumn(pqModel, col("_e")).as("tables"))
    assertSame(coded.select(
      (PqIndex.adcScore(col("codes"), col("tables")) =!=
        PqIndex.adcScoreReference(col("codes"), col("tables"))).as("diff")))
  }

  test("nearest_centroid == aggregate-fold reference, bit-exact (incl. ties)") {
    assertSame(emb.select(
      (IvfIndex.nearestCell(ivfModel, col("embedding")) =!=
        IvfIndex.nearestCellReference(ivfModel, col("embedding"))).as("diff")))
    // exact tie: duplicated centroid — both forms must keep the LOWEST cell
    val tied = IvfIndex.Model(Seq(ivfModel.centroids.head, ivfModel.centroids.head)
      ++ ivfModel.centroids.tail)
    assertSame(emb.select(
      (IvfIndex.nearestCell(tied, col("embedding")) =!=
        IvfIndex.nearestCellReference(tied, col("embedding"))).as("diff")))
  }

  test("probe_cells == array_sort reference, bit-exact (incl. ties)") {
    for (np <- Seq(1, 3, 8)) {
      assertSame(emb.select(
        (IvfIndex.probeCellsColumn(ivfModel, col("embedding"), np) =!=
          IvfIndex.probeCellsColumnReference(ivfModel, col("embedding"), np)).as("diff")))
    }
    val tied = IvfIndex.Model(Seq(ivfModel.centroids.head, ivfModel.centroids.head)
      ++ ivfModel.centroids.tail)
    assertSame(emb.select(
      (IvfIndex.probeCellsColumn(tied, col("embedding"), 4) =!=
        IvfIndex.probeCellsColumnReference(tied, col("embedding"), 4)).as("diff")))
  }
}
