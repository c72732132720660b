package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.tools.ScaleUp

/** The fixture scaler must multiply row counts, keep replica key spaces
  * disjoint but referentially intact, and never manufacture cross-replica
  * near-duplicates (which would quadratically distort pair queries). */
class ScaleUpSpec extends AnyFunSuite with SparkTestBase {

  private val reps = 3

  private lazy val scaled: Map[String, org.apache.spark.sql.DataFrame] =
    Tables.All.map { n =>
      n -> ScaleUp.scaleTable(spark, Tables.load(spark, sf001, n), n, reps)
    }.toMap

  test("row counts multiply; fixed dims stay fixed") {
    val base = Tables.All.map(n => n -> Tables.load(spark, sf001, n).count())
    base.foreach { case (n, c) =>
      val expect = if (n == "region" || n == "nation") c else c * reps
      assert(scaled(n).count() === expect, n)
    }
  }

  test("replica key spaces are disjoint and FKs stay intra-replica") {
    val orders = scaled("orders")
    // every key lands in its replica's stride band
    val bands = orders
      .select((col("o_orderkey") / ScaleUp.KeyStride).cast("long").as("b"))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(bands.toSeq === (0 until reps).map(_.toLong))
    // orders join customers without loss: every o_custkey resolves
    val dangling = orders.join(scaled("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(dangling === 0)
    // and the join stays intra-replica by construction
    val crossRep = orders.join(scaled("customer"),
      col("o_custkey") === col("c_custkey"))
      .where((col("o_orderkey") / ScaleUp.KeyStride).cast("long") =!=
        (col("c_custkey") / ScaleUp.KeyStride).cast("long")).count()
    assert(crossRep === 0)
  }

  test("documents: no text survives across replicas; n_chars tracks text") {
    val docs = scaled("documents")
    val texts = docs.groupBy("text").count().where(col("count") > 1)
    val baseDups = Tables.load(spark, sf001, "documents")
      .groupBy("text").count().where(col("count") > 1).count()
    // within-replica dup structure is preserved (reps copies of each base
    // dup group), but no NEW cross-replica dup groups appear
    assert(texts.count() === baseDups * reps)
    val badLen = docs.where(length(col("text")) =!= col("n_chars")).count()
    assert(badLen === 0)
  }

  test("embeddings: unit norm kept, replicas are not near-dups") {
    val emb = scaled("embeddings")
    val withNorm = emb.withColumn("norm",
      sqrt(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))))
    val offSphere = withNorm.where(abs(col("norm") - 1.0) > 1e-4).count()
    assert(offSphere === 0)
    // cosine(replica k of v, original v) stays well below any dedup radius
    val base = emb.where(col("vec_id") < ScaleUp.KeyStride)
      .select(col("vec_id").as("bid"), col("embedding").as("bvec"))
    val rep1 = emb.where(col("vec_id") >= ScaleUp.KeyStride &&
        col("vec_id") < 2 * ScaleUp.KeyStride)
      .select((col("vec_id") - ScaleUp.KeyStride).as("rid"),
        col("embedding").as("rvec"))
    val cos = base.join(rep1, col("bid") === col("rid"))
      .select(aggregate(zip_with(col("bvec"), col("rvec"),
        (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0d), (acc, x) => acc + x).as("cos"))
    val stats = cos.agg(max("cos").as("mx"), avg("cos").as("av"))
      .collect().head
    assert(stats.getDouble(0) < 0.8, s"max cross-replica cosine ${stats}")
    assert(math.abs(stats.getDouble(1) - 0.45) < 0.15,
      s"mean cross-replica cosine drifted: ${stats}")
  }

  test("scaling is deterministic") {
    val a = scaled("embeddings").orderBy("vec_id").collect()
    val b = ScaleUp.scaleTable(spark,
        Tables.load(spark, sf001, "embeddings"), "embeddings", reps)
      .orderBy("vec_id").collect()
    assert(a.sameElements(b))
  }
}
