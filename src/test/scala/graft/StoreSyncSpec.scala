package graft

import graft.model.CellTable
import graft.operators.StoreSync
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SyncTable analogue: the repair batch makes the destination's visible
  * view identical to the source's, costs ∝ divergence, and is idempotent. */
class StoreSyncSpec extends AnyFunSuite with SparkTestBase {

  private val SyncTs = 1800000000000L

  private def visibleSet(df: org.apache.spark.sql.DataFrame) =
    CellTable.visibleLatest(df)
      .select(col("rowKey").cast("string"), col("qualifier").cast("string"),
        col("value").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("mutations repair drops, corruptions, and dest-only cells exactly") {
    val src = CellTable.fromTable(spark, sf001, "region") // 5 rows × r_name
    val keyL = CellTable.keyToLong(col("rowKey"))
    val dest = src.filter(keyL =!= 0L) // drop row 0
      .withColumn("value",
        when(keyL === 1L, lit("garbled").cast("binary")).otherwise(col("value")))
      .unionByName(spark.range(1).select( // ghost row only dest has
        CellTable.bigEndianKey(lit(99L)).as("rowKey"),
        lit("region").as("family"),
        lit("r_name").cast("binary").as("qualifier"),
        lit(CellTable.BaseTs).as("ts"),
        lit("Put").as("cellType"),
        lit("ghost").cast("binary").as("value")))

    val muts = StoreSync.mutations(src, dest, SyncTs).collect()
    val puts = muts.filter(_.getAs[String]("cellType") == "Put")
    val dels = muts.filter(_.getAs[String]("cellType") == "Delete")
    assert(puts.length == 2) // dropped row 0 + corrupted row 1
    assert(dels.length == 1) // the ghost
    assert(muts.forall(_.getAs[Long]("ts") == SyncTs))

    // post-repair view ≡ source view (value-level)
    assert(visibleSet(StoreSync.syncedView(src, dest, SyncTs)) == visibleSet(src))
    // in-sync stores produce an empty batch (idempotence)
    val repaired = dest.unionByName(
      StoreSync.mutations(src, dest, SyncTs))
    assert(StoreSync.mutations(src, repaired, SyncTs + 1).isEmpty)
  }

  test("matched cells keep their history; repairs are stamped syncTs") {
    val src = CellTable.fromTable(spark, sf001, "region")
    val keyL = CellTable.keyToLong(col("rowKey"))
    val dest = src.filter(keyL =!= 2L)
    val view = StoreSync.syncedView(src, dest, SyncTs)
    val byKey = view.select(CellTable.keyToLong(col("rowKey")).as("k"), col("ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey(2L) == SyncTs)
    assert(byKey.filterNot(_._1 == 2L).values.forall(_ == CellTable.BaseTs))
  }

  test("sync repairs a cell-store directory in place, preserving layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sync").toString
    val src = CellTable.fromTable(spark, sf001, "customer")
    val keyL = CellTable.keyToLong(col("rowKey"))
    src.filter(keyL =!= 42L) // dest store misses row 42
      .write.format("cellstore").option("buckets", "4")
      .mode("overwrite").save(dir)

    val n = StoreSync.sync(spark, src, dir, SyncTs)
    assert(n == 4) // row 42's four qualifiers re-put

    val repaired = spark.read.format("cellstore").load(dir)
    assert(visibleSet(repaired) == visibleSet(src))
    // salted layout survived the append: a pushed GET touches one bucket
    val get = repaired.filter(col("rowKey") === CellTable.bigEndianKey(lit(42L)))
    assert(get.count() == 4)
    // second sync finds nothing to repair
    assert(StoreSync.sync(spark, src, dir, SyncTs + 1) == 0L)
  }
}
