package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theta-sketch set operations (Spark 4 built-in datasketches surface) as
  * used by [[Sketches.thetaVocabOverlap]]: distinct state that, unlike
  * HLL, supports intersection and difference — the 100 TB shape for
  * cross-source overlap accounting. */
class ThetaSketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("theta sketch: exact regime — intersection and difference are exact") {
    val rows = Seq(
      ("A", "a"), ("A", "b"), ("A", "c"), ("A", "d"),
      ("B", "c"), ("B", "d"), ("B", "e")
    ).toDF("source", "tok")
    val per = rows.groupBy("source").agg(theta_sketch_agg(col("tok")).as("sk"))
    val r = per.alias("x").join(per.alias("y"), col("x.source") < col("y.source"))
      .select(
        theta_sketch_estimate(col("x.sk")).cast("double").as("na"),
        theta_sketch_estimate(col("y.sk")).cast("double").as("nb"),
        theta_sketch_estimate(theta_intersection(col("x.sk"), col("y.sk")))
          .cast("double").as("inter"),
        theta_sketch_estimate(theta_difference(col("x.sk"), col("y.sk")))
          .cast("double").as("diff"))
      .head
    // below 2^lgK retained hashes the sketch IS the exact set
    assert(r.getDouble(0) == 4.0 && r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 2.0, "A∩B = {c,d}")
    assert(r.getDouble(3) == 2.0, "A\\B = {a,b}")
  }

  test("theta sketch: estimation regime — set-op estimates within 5% of union") {
    // two 60k-element ranges overlapping in [40k, 60k): far beyond the
    // default nominal entries, so both sketches downsample
    val a = spark.range(0, 60000).select(lit("A").as("s"), col("id").cast("string").as("tok"))
    val b = spark.range(40000, 100000).select(lit("B").as("s"), col("id").cast("string").as("tok"))
    val per = a.unionByName(b).groupBy("s")
      .agg(theta_sketch_agg(col("tok")).as("sk"))
    val r = per.alias("x").join(per.alias("y"), col("x.s") < col("y.s"))
      .select(
        theta_sketch_estimate(theta_intersection(col("x.sk"), col("y.sk")))
          .cast("double").as("inter"),
        theta_sketch_estimate(theta_difference(col("x.sk"), col("y.sk")))
          .cast("double").as("diff"))
      .head
    val union = 100000.0
    assert(math.abs(r.getDouble(0) - 20000.0) <= 0.05 * union,
      s"intersection estimate ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 40000.0) <= 0.05 * union,
      s"difference estimate ${r.getDouble(1)}")
  }

  test("theta sketch: partial states merge across partitions; sketches re-merge") {
    // 64 input partitions force real partial-buffer serialization+merge
    val est = spark.range(0, 50000).repartition(64)
      .select(col("id").cast("string").as("tok"))
      .agg(theta_sketch_estimate(theta_sketch_agg(col("tok"))).cast("double"))
      .head.getDouble(0)
    assert(math.abs(est - 50000.0) <= 0.03 * 50000.0, s"estimate $est")
    // two INDEPENDENTLY built sketches union back to the whole corpus —
    // the persisted-artifact re-merge path (theta_union_agg over sketches)
    val half1 = spark.range(0, 25000).select(col("id").cast("string").as("tok"))
      .agg(theta_sketch_agg(col("tok")).as("sk"))
    val half2 = spark.range(25000, 50000).select(col("id").cast("string").as("tok"))
      .agg(theta_sketch_agg(col("tok")).as("sk"))
    val merged = half1.unionByName(half2)
      .agg(theta_sketch_estimate(theta_union_agg(col("sk"))).cast("double"))
      .head.getDouble(0)
    assert(math.abs(merged - 50000.0) <= 0.03 * 50000.0, s"union estimate $merged")
  }

  test("theta overlap check query: all pair bounds hold on the fixtures") {
    val r = Sketches.thetaOverlapCheckQuery(spark, sf01).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Boolean]("inter_within_bound")))
    assert(r.forall(_.getAs[Boolean]("diff_within_bound")))
    // sanity: unions are consistent with the parts
    r.foreach { x =>
      assert(x.getAs[Long]("n_union") ==
        x.getAs[Long]("n_a") + x.getAs[Long]("n_b") - x.getAs[Long]("n_inter"))
    }
  }
}
