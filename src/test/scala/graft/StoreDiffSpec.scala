package graft

import graft.model.CellTable
import graft.operators.StoreDiff
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cell-level store diff (VerifyReplication analogue): classification
  * exactness and the zero-exchange plan over two same-N salted stores. */
class StoreDiffSpec extends AnyFunSuite with SparkTestBase {

  test("diff classifies drops, additions, and corruptions exactly") {
    val src = CellTable.fromTable(spark, sf001, "region") // 5 rows × 1 qual (r_name)
    val keyL = CellTable.keyToLong(col("rowKey"))
    // copy: drop row 0, corrupt r_name of row 1, add a bogus row 99
    val copied = src.filter(keyL =!= 0L)
      .withColumn("value",
        when(keyL === 1L && col("qualifier").cast("string") === "r_name",
          lit("garbled").cast("binary")).otherwise(col("value")))
      .unionByName(src.limit(0).unionByName(spark.range(1).select(
        CellTable.bigEndianKey(lit(99L)).as("rowKey"),
        lit("region").as("family"),
        lit("r_name").cast("binary").as("qualifier"),
        lit(CellTable.BaseTs).as("ts"),
        lit("Put").as("cellType"),
        lit("ghost").cast("binary").as("value"))))
    val byStatus = StoreDiff.summary(src, copied).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus("ONLY_SOURCE") == 1)   // row 0's r_name cell
    assert(byStatus("ONLY_DEST") == 1)     // the ghost cell
    assert(byStatus("VALUE_MISMATCH") == 1)
    assert(byStatus("MATCH") == src.count() - 2)
    // report carries only the divergence
    assert(StoreDiff.report(src, copied).count() == 3)
  }

  test("two same-N salted stores diff with zero exchange (SPJ)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_diff_spj").toString
    val cells = CellTable.fromTable(spark, sf001, "customer")
    cells.write.format("cellstore").option("buckets", "4")
      .mode("overwrite").save(s"$dir/a")
    cells.filter(CellTable.keyToLong(col("rowKey")) =!= 42L)
      .write.format("cellstore").option("buckets", "4")
      .mode("overwrite").save(s"$dir/b")
    val cat = "diffspj"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CellStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)
    val prevBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevThreshold = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevRequireAll = spark.conf.getOption("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the diff joins on the FULL coordinate; the stores partition on rowKey
    // only — allow co-partitioning when partition keys are a subset of the
    // join keys
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val rep = StoreDiff.report(spark.table(s"$cat.a"), spark.table(s"$cat.b"))
      val plan = rep.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a storage-partitioned diff, got:\n$plan")
      val rows = rep.collect()
      assert(rows.length == 4) // row 42's four cells, source-only
      assert(rows.forall(_.getAs[String]("status") == "ONLY_SOURCE"))
    } finally {
      prevBucketing.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      prevThreshold.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      prevRequireAll.fold(spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition"))(
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", _))
    }
  }
}
