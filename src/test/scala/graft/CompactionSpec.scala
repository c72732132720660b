package graft

import graft.model.CellTable
import graft.operators.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction: TTL expiry + version retention over the cell store, in
  * place, with the region layout re-established by the writer. */
class CompactionSpec extends AnyFunSuite with SparkTestBase {

  test("in-place compaction keeps the newest version and drops expired cells") {
    val dir = java.nio.file.Files.createTempDirectory("cellstore_compact").toString
    val base = CellTable.fromTable(spark, sf001, "customer")
    // every 5th key gets 2 extra newer versions (ts+1000, ts+2000)
    val versioned = CellTable.withExtraVersions(
      base, pmod(conv(hex(col("rowKey")), 16, 10).cast("bigint"), lit(5)) === 0, n = 2)
    CellTable.writeRegionLayout(versioned, dir, numRegions = 4)

    val before = spark.read.format("cellstore").load(dir)
    val nBase = base.count()
    assert(before.count() > nBase)

    Compaction.compactStore(spark, dir, maxVersions = 1,
      ttlWatermark = Long.MinValue, numRegions = 4)

    val after = spark.read.format("cellstore").load(dir)
    // one surviving version per coordinate
    assert(after.count() == nBase)
    assert(after.groupBy("rowKey", "family", "qualifier").count()
      .filter(col("count") > 1).isEmpty)
    // the survivor is the NEWEST version: multi-version keys show the #v2 value
    val multi = after.filter(
      pmod(conv(hex(col("rowKey")), 16, 10).cast("bigint"), lit(5)) === 0)
    assert(multi.count() > 0)
    assert(multi.collect().forall(r =>
      new String(r.getAs[Array[Byte]]("value")).endsWith("#v2")))
    // and the rewritten layout still prunes: point GET = 1 partition
    val key42 = java.nio.ByteBuffer.allocate(8).putLong(42L).array()
    assert(after.filter(col("rowKey") === lit(key42)).rdd.getNumPartitions == 1)
  }

  test("TTL watermark expires whole rows deterministically") {
    import spark.implicits._
    val cells = Seq(
      ("k1", 1000L, "old"), ("k1", 5000L, "new"), ("k2", 900L, "expired")
    ).toDF("k", "ts", "v")
      .select(col("k").cast("binary").as("rowKey"), lit("f").as("family"),
        lit("q").cast("binary").as("qualifier"), col("ts"),
        lit("Put").as("cellType"), col("v").cast("binary").as("value"))
    val out = Compaction.survivors(cells, maxVersions = 99, ttlWatermark = 1000L)
      .select(col("value").cast("string")).collect().map(_.getString(0)).toSet
    assert(out == Set("old", "new")) // ts=900 expired; both k1 versions kept
  }

  test("compacting a salted store preserves the salt layout") {
    val dir = java.nio.file.Files.createTempDirectory("cellstore_salt_compact").toString + "/s"
    val base = CellTable.fromTable(spark, sf001, "nation")
    val versioned = CellTable.withExtraVersions(
      base, CellTable.keyToLong(col("rowKey")) % 2 === 0, n = 2)
    versioned.write.format("cellstore").option("buckets", "4")
      .mode("overwrite").save(dir)

    Compaction.compactStore(spark, dir, maxVersions = 1)

    // still salted: manifest intact, files bucket-named, GET plans 1 bucket
    assert(new java.io.File(s"$dir/_cellstore_meta.json").exists())
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.getName.startsWith("bucket-")))
    val store = spark.read.format("cellstore").load(dir)
    assert(store.count() == base.count()) // one surviving version per cell
    val get = store.filter(col("rowKey") ===
      lit(java.nio.ByteBuffer.allocate(8).putLong(3L).array()))
    assert(get.rdd.getNumPartitions == 1)
    assert(get.count() == 2) // one cell per non-key nation column (n_name, n_regionkey)
  }
}
