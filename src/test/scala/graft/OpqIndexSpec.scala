package graft

import graft.operators.{EmbeddingPca, OpqIndex, PqIndex, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPQ: the rotation is orthonormal and variance-balanced, rotating
  * preserves cosine ranking, and the full pipeline's recall never loses
  * to plain PQ at the same code budget. */
class OpqIndexSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb = Tables.load(spark, sf001, "embeddings")
  private lazy val pca = EmbeddingPca.fitCached(spark, sf001)
  private lazy val model = OpqIndex.train(spark, sf001, emb)

  test("eigenvalue allocation: a balanced partition of the components") {
    val alloc = OpqIndex.balancedAllocation(pca.eigenvalues, m = 8)
    assert(alloc.size == 8)
    assert(alloc.forall(_.size == 8))
    assert(alloc.flatten.sorted == (0 until 64).toList)
    // balance: the greedy log-product spread must beat the naive
    // contiguous split (components 0-7 | 8-15 | …), which is what
    // concentrates variance in subspace 0 — the failure OPQ exists to fix
    def spread(a: Seq[Seq[Int]]): Double = {
      val sums = a.map(_.map(i => math.log(pca.eigenvalues(i))).sum)
      sums.max - sums.min
    }
    val naive = (0 until 64).grouped(8).toSeq.map(_.toSeq)
    assert(spread(alloc) <= spread(naive),
      s"greedy spread ${spread(alloc)} worse than contiguous ${spread(naive)}")
  }

  test("rotation rows are orthonormal (float-rounded PCA components)") {
    val r = model.rotation
    assert(r.length == 64 && r.forall(_.length == 64))
    for (i <- 0 until 64; j <- i until 64) {
      val dot = (0 until 64).map(d => r(i)(d).toDouble * r(j)(d)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-4, s"row $i · row $j = $dot")
    }
  }

  test("rotation preserves cosine: rotated pairs score as raw pairs") {
    val rotated = OpqIndex.rotate(emb, model.rotation)
    def cos(df: org.apache.spark.sql.DataFrame): Map[Long, Double] = {
      val q = df.filter(col("vec_id") === 0L)
        .select(col("embedding").as("qv"))
      df.filter(col("vec_id") > 0 && col("vec_id") < 6).crossJoin(q)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.cosine_sim(col("embedding"), col("qv"))
            .as("c"))
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("c")).toMap
    }
    val raw = cos(emb)
    val rot = cos(rotated)
    raw.foreach { case (id, c) =>
      assert(math.abs(c - rot(id)) < 1e-4, s"vec $id: raw $c vs rotated ${rot(id)}")
    }
  }

  /** Quantization distortion ‖x − decode(encode(x))‖² averaged over the
    * corpus, in the space the codes were trained in. */
  private def mse(encoded: org.apache.spark.sql.DataFrame,
      vecs: org.apache.spark.sql.DataFrame, books: PqIndex.Codebooks): Double = {
    val joined = encoded.join(vecs, "vec_id")
    val err = (0 until books.m).map { s =>
      val cw = element_at(typedlit(books.books(s)),
        element_at(col("codes"), s + 1) + 1)
      val sl = slice(col("embedding"), s * books.subDim + 1, books.subDim)
      aggregate(zip_with(sl, cw, (a, b) => (a - b).cast("double") * (a - b)),
        lit(0d), (acc, x) => acc + x)
    }.reduce(_ + _)
    joined.select(avg(err)).head.getDouble(0)
  }

  test("cross-subspace correlation: the rotation slashes quantization distortion") {
    // Rank-8 latent corpus: y_d = w_d · x_{d mod 8} — every RAW subspace
    // sees a scaled copy of the same 8-d latent vector, the structure
    // product quantization cannot exploit (each subspace re-encodes the
    // same information with 16 codewords) and the PCA rotation converts
    // into one live coordinate per subspace (eigenvalue allocation deals
    // the 8 live components one per bucket). This is OPQ's actual claim,
    // pinned where it is provable; on the near-isotropic fixture corpus
    // the rotation is neutral by construction (covariance ≈ σ²I), which
    // is why the recall gate holds opq at pq's floor instead of above it.
    val raw = Tables.load(spark, sf001, "embeddings")
    val weights = (0 until 64).map(d => (1.0 / (1.0 + d / 16.0)).toFloat)
    val yCols = (0 until 64).map(d =>
      (element_at(col("embedding"), d % 8 + 1) * lit(weights(d))).cast("float"))
    val corr = raw.select(col("vec_id"), array(yCols: _*).as("embedding"))
      .localCheckpoint()

    val pqModel = PqIndex.train(corr, dim = 64, m = 8, k = 16, iters = 2)
    val nv = corr.select(col("vec_id"),
      PqIndex.normed(col("embedding")).as("embedding"))
    val msePq = mse(PqIndex.encode(corr, pqModel), nv, pqModel)

    val corrPca = EmbeddingPca.fit(nv, 64)
    // the live/dead eigen split the construction promises
    assert(corrPca.eigenvalues(7) > 1e-3 && corrPca.eigenvalues(8) < 1e-6)
    val rot = OpqIndex.rotationRows(corrPca, 8)
    val rotated = OpqIndex.rotate(corr, rot).localCheckpoint()
    val opqPq = PqIndex.train(rotated, dim = 64, m = 8, k = 16,
      iters = 2, normalize = false)
    val mseOpq = mse(PqIndex.encodePrepared(rotated, opqPq), rotated, opqPq)
    assert(mseOpq < 0.2 * msePq,
      s"rotation should slash distortion on rank-8 data: pq=$msePq opq=$mseOpq")
  }

  test("OPQ pipeline: deterministic, and recall clears the gate floor") {
    val queries = emb.filter(col("vec_id") < 5)
    val truth = Similarity.bruteForceTopK(emb, queries, k = 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
        .count(truth.contains).toDouble / truth.size

    val opq = OpqIndex.searchWithRerank(emb, queries, model, k = 10, r = 50)
    val opqRows = opq.collect().toSet
    assert(OpqIndex.searchWithRerank(emb, queries, model, k = 10, r = 50)
      .collect().toSet == opqRows, "OPQ search must be deterministic")
    // no ordering pin against plain PQ: the fixture corpus is
    // near-isotropic, where any rotation is neutral and recall deltas
    // are seed/tie noise in either direction (see the rank-8 test for
    // the provable claim). The floor is the same contract as pq's.
    assert(recall(opq) >= 0.4, s"OPQ recall ${recall(opq)} under the gate floor")
  }
}
