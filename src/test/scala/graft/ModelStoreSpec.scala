package graft

import graft.operators.{BpeTrainer, EmbeddingPca, ModelStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ModelStoreSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft-models").toString

  test("BPE merges round-trip exactly through the store") {
    val (merges, _) = BpeTrainer.trainCached(spark, sf001)
    assert(merges.nonEmpty)
    ModelStore.saveBpeMerges(spark, merges, dir)
    assert(ModelStore.loadBpeMerges(spark, dir) == merges)
  }

  test("PCA model round-trips bit-exactly and projects identically") {
    val emb = graft.sources.Tables.load(spark, sf001, "embeddings")
    val m = EmbeddingPca.fitCached(spark, sf001)
    ModelStore.savePcaModel(spark, m, dir)
    val loaded = ModelStore.loadPcaModel(spark, dir)
    assert(loaded.mean.toSeq == m.mean.toSeq)
    assert(loaded.eigenvalues.toSeq == m.eigenvalues.toSeq)
    assert(loaded.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
    assert(loaded.covTrace == m.covTrace)
    // a consumer that never saw the corpus projects identically
    val a = EmbeddingPca.project(emb, m, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = EmbeddingPca.project(emb, loaded, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
  }
}
