package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Fixture scaler: synthesizes a larger scale factor from an existing one by
 * replicating every table `reps` times with disjoint key spaces, so scaling
 * slopes (t(sfBig)/t(sfSmall)) can be measured without a driver-side
 * generator. The output preserves the *workload shape* of the source
 * fixture, which is what a scaling measurement needs:
 *
 *  - **Referential integrity per replica.** Every long surrogate key
 *    (custkey, orderkey, partkey, suppkey, event_id, user_id, doc_id,
 *    vec_id) is offset by `rep * KeyStride`, on both the primary-key side
 *    and every foreign-key side, so replica i's orders join replica i's
 *    customers. Join fan-outs and group sizes therefore stay constant while
 *    row counts grow by `reps` — the scaling regime of a real corpus, where
 *    10x data is 10x entities, not 10x versions of the same entity.
 *  - **Fixed dimensions stay fixed.** `region` and `nation` are copied
 *    verbatim (TPC-H keeps them constant across scale factors); group-by
 *    cardinalities on nation/region/mktsegment/brand do not grow.
 *  - **No synthetic near-duplicates.** Replicated document text is
 *    token-suffixed per replica (`w` -> `w·r<i>`), so shingles, lines,
 *    simhash bands, and minhash signatures never collide across replicas;
 *    within-replica duplicate structure is preserved exactly. A verbatim
 *    copy would instead turn every doc into a `reps`-way duplicate group
 *    and quadratically inflate every pair-enumeration query — measuring an
 *    artifact of the generator, not the plan.
 *  - **Embeddings get fresh directions, same cluster structure.** Replica
 *    vectors blend the original with deterministic hash noise
 *    (`normalize(a*v + noise)`, a = 0.45, matching the source corpus's
 *    max pairwise cosine) and keep their `label`, so IVF/k-means cluster
 *    geometry scales naturally and no replica is an artificial near-dup of
 *    its original (cross-replica cosine ~0.45, far below any dedup radius).
 *
 * Determinism: replica content depends only on (source row, rep) — the
 * noise PRNG is Murmur3 `hash(vec_id, rep, dim)` — so two runs produce
 * byte-identical fixtures.
 *
 * Not part of the query surface; a fixture tool like the TSV importer.
 */
object ScaleUp {
  /** Key-space stride between replicas; far above any base fixture's max
    * surrogate key (sf0.1 tops out at ~6e5), far below Long overflow even
    * at thousands of replicas. */
  val KeyStride: Long = 1000000000L

  def main(args: Array[String]): Unit = {
    val in = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_IN", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_OUT", "localdata/sf1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_REPS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, in, out, reps)
    spark.stop()
  }

  def run(spark: SparkSession, in: String, out: String, reps: Int): Unit =
    Tables.All.foreach { name =>
      val scaled = scaleTable(spark, Tables.load(spark, in, name), name, reps)
      // single output file per table mirrors the driver fixtures' layout so
      // scan parallelism at both scale factors comes from row-group
      // splitting, not from a file-count difference the generator invented
      scaled.coalesce(1).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name x$reps -> $out/$name.parquet")
    }

  /** Cross-joins with a `rep` index (broadcast, so replication is a narrow
    * map over the scan) and rewrites keys/content per replica. */
  def scaleTable(spark: SparkSession, df: DataFrame, name: String,
      reps: Int): DataFrame = {
    if (name == "region" || name == "nation") return df
    val repDf = broadcast(
      spark.range(reps.toLong).select(col("id").cast("int").as("rep")))
    val crossed = df.crossJoin(repDf)
    def off(c: String) = (col(c) + col("rep").cast("long") * KeyStride).as(c)
    val result = name match {
      case "customer" => crossed.select(
        off("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      case "supplier" => crossed.select(
        off("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      case "part" => crossed.select(
        off("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"))
      case "orders" => crossed.select(
        off("o_orderkey"), off("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      case "lineitem" => crossed.select(
        off("l_orderkey"), off("l_partkey"), off("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
      case "events" => crossed.select(
        off("event_id"), col("ts"), off("user_id"), col("event_type"),
        col("value"), col("props"))
      case "documents" =>
        // rep 0 keeps the source text verbatim; rep > 0 suffixes every
        // whitespace token so no shingle/line/token survives across replicas
        val text = when(col("rep") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit("r"), col("rep"))), " "))
        crossed.select(
          off("doc_id"), text.as("text"), col("lang"), col("source"),
          length(text).cast("long").as("n_chars"))
      case "embeddings" =>
        // blend = 0.45*v + hash-noise, then L2-normalize back to the unit
        // sphere; per-dim noise amplitude 0.193 gives E[noise norm] ~ 0.89
        // over 64 dims, so E[cos(v', v)] ~ 0.45 (the source corpus's max
        // pairwise cosine) — structurally related, never a near-dup
        val blended = when(col("rep") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            (x.cast("double") * lit(0.45) +
              (pmod(hash(col("vec_id"), col("rep"), i), lit(100000))
                .cast("double") / lit(100000.0) - lit(0.5)) * lit(0.3865))))
        val withBlend = crossed.withColumn("blend", blended)
          .withColumn("norm",
            sqrt(aggregate(col("blend"), lit(0.0d), (a, x) => a + x * x)))
        withBlend.select(
          off("vec_id"),
          transform(col("blend"), x => (x / col("norm")).cast("float"))
            .as("embedding"),
          col("label"))
      case other => throw new IllegalArgumentException(
        s"no scale rule for table $other")
    }
    result
  }
}
