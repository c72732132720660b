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

  test("incremental export: multi-batch stream verifies; replay is idempotent; crash orphan is flagged then healed") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft-increxport").toString
    val out = s"$base/export"
    def allOk() = DatasetExport.verifyIncremental(spark, out).collect()
    def docs(r: Range) = r.map(i => (i.toLong, s"streamed doc $i body words"))

    val q = graft.streaming.StreamExport.start(
      input.toDF().toDF("doc_id", "text"), out, numShards = 4,
      checkpoint = s"$base/ckpt")
    try {
      input.addData(docs(0 until 30): _*); q.processAllAvailable()
      input.addData(docs(30 until 60): _*); q.processAllAvailable()
    } finally q.stop()
    val v1 = allOk()
    assert(v1.forall(_.getAs[Boolean]("manifest_ok")))
    assert(v1.map(_.getAs[Long]("n_docs")).sum == 60L)

    // at-least-once replay window: batch 1 runs again with the same id —
    // overwrite-by-batch-id makes both writes no-ops
    DatasetExport.appendBatch(docs(30 until 60).toDF("doc_id", "text"), out, 4, 1L)
    val v2 = allOk()
    assert(v2.forall(_.getAs[Boolean]("manifest_ok")))
    assert(v2.map(_.getAs[Long]("n_docs")).sum == 60L)

    // crash between the two writes: shard data landed, manifest didn't —
    // the audit must flag it, and the healing replay must clear it
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    DatasetExport.appendBatch(docs(60 until 70).toDF("doc_id", "text"), out, 4, 2L)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/manifest/batch=2"), true)
    val v3 = allOk()
    assert(v3.exists(!_.getAs[Boolean]("manifest_ok")),
      "orphaned shard data must fail the audit")
    DatasetExport.appendBatch(docs(60 until 70).toDF("doc_id", "text"), out, 4, 2L)
    val v4 = allOk()
    assert(v4.forall(_.getAs[Boolean]("manifest_ok")))
    assert(v4.map(_.getAs[Long]("n_docs")).sum == 70L)
  }

  test("fixture export audit: every shard verifies") {
    val r = graft.operators.DatasetExport.exportAuditQuery(spark, sf001).collect()
    assert(r.length == 8)
    assert(r.forall(_.getAs[Boolean]("manifest_ok")))
  }
}
