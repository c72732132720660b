package graft

import graft.operators.DatasetExport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DatasetExportSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("export + verify: clean round-trip, complete coverage, tamper detected") {
    val docs = (0 until 60).map(i => (i.toLong, s"doc number $i with words"))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-export").toString
    val manifest = DatasetExport.exportShards(docs, out, numShards = 4)
    assert(manifest.agg(sum("n_docs")).head.getLong(0) == 60L)

    val v = DatasetExport.verifyExport(spark, out).collect()
    assert(v.length == 4)
    assert(v.forall(_.getAs[Boolean]("manifest_ok")))
    assert(v.map(_.getAs[Long]("n_docs")).sum == 60L)

    // tamper with one shard: append a duplicate row file — the digest
    // and count both move, the verifier flags exactly that shard
    val shard0 = s"$out/shards/shard=0"
    docs.limit(1).drop("doc_id")
      .withColumn("doc_id", lit(999L)).select("doc_id", "text")
      .write.mode("append").parquet(shard0)
    val after = DatasetExport.verifyExport(spark, out).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Boolean]("manifest_ok")).toMap
    assert(!after(0L), "tampered shard must fail verification")
    assert((1L to 3L).forall(after(_)), "untouched shards still pass")
  }

  test("fixture export audit: every shard verifies") {
    val r = graft.operators.DatasetExport.exportAuditQuery(spark, sf001).collect()
    assert(r.length == 8)
    assert(r.forall(_.getAs[Boolean]("manifest_ok")))
  }
}
