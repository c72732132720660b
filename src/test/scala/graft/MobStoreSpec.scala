package graft

import graft.model.CellTable
import graft.operators.MobStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MOB storage: threshold split, content-addressed dedup, transparent
  * resolution, and the write-amplification invariant (compacting the main
  * store never rewrites a blob file). */
class MobStoreSpec extends AnyFunSuite with SparkTestBase {

  private val Threshold = 300

  private def docCells = CellTable.fromTable(spark, sf001, "documents")

  private def mobFiles(dir: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(s"$dir/mob")
    d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
  }

  test("round trip: resolved read equals the original cells") {
    val dir = java.nio.file.Files.createTempDirectory("mob_rt").toString
    MobStore.writeMob(docCells, dir, Threshold)
    val resolved = MobStore.readResolved(spark, dir)
      .select("rowKey", "family", "qualifier", "ts", "cellType", "value")
    assert(resolved.exceptAll(docCells).isEmpty && docCells.exceptAll(resolved).isEmpty)
    // and the split actually happened: both refs and plain cells exist
    val main = MobStore.readMain(spark, dir)
    assert(main.filter(col("cellType") === MobStore.RefType).count() > 0)
    assert(main.filter(col("cellType") === "Put").count() > 0)
  }

  test("main store keeps no value at or above the threshold") {
    val dir = java.nio.file.Files.createTempDirectory("mob_small").toString
    MobStore.writeMob(docCells, dir, Threshold)
    val maxMain = MobStore.readMain(spark, dir)
      .agg(max(length(col("value")))).collect().head.getInt(0)
    assert(maxMain < Threshold,
      s"main store still carries a $maxMain-byte value (threshold $Threshold)")
    // every ref resolves: no dangling references
    val resolved = MobStore.readResolved(spark, dir)
    val refs = MobStore.readMain(spark, dir)
      .filter(col("cellType") === MobStore.RefType).count()
    val blobs = resolved.count() - MobStore.readMain(spark, dir)
      .filter(col("cellType") =!= MobStore.RefType).count()
    assert(blobs == refs, s"$refs refs but $blobs resolved blobs")
  }

  test("content addressing: duplicate blobs are stored once") {
    val dir = java.nio.file.Files.createTempDirectory("mob_dup").toString
    // ten rows share one big value, two rows another
    val rows = (1 to 10).map(i => (i.toLong, "A" * 400)) ++
      Seq((11L, "B" * 400), (12L, "B" * 400), (13L, "tiny"))
    val cells = CellTable.toCells(
      spark.createDataFrame(rows).toDF("id", "payload"),
      Seq("id"), "blobs", lit(CellTable.BaseTs))
    MobStore.writeMob(cells, dir, Threshold)
    assert(spark.read.parquet(s"$dir/mob").count() == 2) // A-blob + B-blob
    val resolved = MobStore.readResolved(spark, dir)
    assert(resolved.count() == 13)
    assert(resolved.exceptAll(cells).isEmpty && cells.exceptAll(resolved).isEmpty)
  }

  test("compacting the main store never touches a mob file") {
    val dir = java.nio.file.Files.createTempDirectory("mob_compact").toString
    // version churn on the small qualifiers only — blob cells stay 1-version
    val versioned = CellTable.withExtraVersions(
      docCells, col("qualifier").cast("string") === "lang", n = 3)
    MobStore.writeMob(versioned, dir, Threshold)
    val before = mobFiles(dir)
    val cellsBefore = MobStore.readMain(spark, dir).count()
    MobStore.compactMain(spark, dir, maxVersions = 1)
    assert(mobFiles(dir) == before, "mob files were rewritten by a main compaction")
    val cellsAfter = MobStore.readMain(spark, dir).count()
    assert(cellsAfter < cellsBefore, "compaction dropped no superseded versions")
    // post-compaction resolved read = latest-version view of the original
    val resolved = MobStore.readResolved(spark, dir)
      .select("rowKey", "family", "qualifier", "ts", "cellType", "value")
    val expected = CellTable.visibleLatest(versioned)
    assert(resolved.exceptAll(expected).isEmpty && expected.exceptAll(resolved).isEmpty)
  }

  test("reclaim drops exactly the blobs a purge orphaned") {
    val dir = java.nio.file.Files.createTempDirectory("mob_gc").toString
    val rows = Seq((1L, "P" * 400), (2L, "Q" * 400), (3L, "R" * 400), (4L, "tiny"))
    import spark.implicits._
    val cells = CellTable.toCells(rows.toDF("id", "payload"),
      Seq("id"), "blobs", lit(CellTable.BaseTs))
    MobStore.writeMob(cells, dir, Threshold)
    assert(spark.read.parquet(s"$dir/mob").count() == 3)

    // purge subject 1: a delete marker masks its payload cell
    val markers = CellTable.withDeleteMarkers(
        cells.filter(CellTable.keyToLong(col("rowKey")) === 1L),
        lit(true), lit(CellTable.BaseTs + 10))
      .filter(col("cellType") === "Delete")
    markers.write.format("cellstore").mode("append")
      .option("numRegions", "8").save(s"$dir/main")

    // BEFORE compaction the masked ref is still physically present, and
    // as-of reads can still reach it — reclaim must keep its blob
    assert(MobStore.reclaimMob(spark, dir) == ((3L, 0L)))

    // the major compaction physically removes the masked ref; now the
    // blob is a true orphan
    MobStore.compactMain(spark, dir, maxVersions = 1)
    val (kept, dropped) = MobStore.reclaimMob(spark, dir)
    assert((kept, dropped) == (2L, 1L))
    // the purged subject's bytes are PHYSICALLY gone from the side table
    val remaining = spark.read.parquet(s"$dir/mob")
      .select(col("value").cast("string")).collect().map(_.getString(0)).toSet
    assert(remaining == Set("Q" * 400, "R" * 400))
    // survivors still resolve through the delete-visible read
    val visible = CellTable.visibleLatest(MobStore.readResolved(spark, dir))
      .select(CellTable.keyToLong(col("rowKey")).as("id"),
        col("value").cast("string").as("payload"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    assert(visible == Map(2L -> "Q" * 400, 3L -> "R" * 400, 4L -> "tiny"))
  }

  test("per-family thresholds: same bytes MOB'd in one family, inline in another") {
    val dir = java.nio.file.Files.createTempDirectory("mob_fam").toString
    import spark.implicits._
    val mk = (fam: String, id: Long) => CellTable.toCells(
      Seq((id, "Z" * 400)).toDF("id", "payload"), Seq("id"), fam, lit(CellTable.BaseTs))
    val cells = mk("images", 1L).unionByName(mk("text", 2L))
    MobStore.writeMobPerFamily(cells, dir,
      thresholds = Map("images" -> 300, "text" -> 1000), default = 300)
    val main = MobStore.readMain(spark, dir)
    // images: 400 >= 300 → MOB'd; text: 400 < 1000 → inline
    assert(main.filter(col("family") === "images" &&
      col("cellType") === MobStore.RefType).count() == 1)
    assert(main.filter(col("family") === "text" &&
      col("cellType") === "Put" && length(col("value")) === 400).count() == 1)
    assert(spark.read.parquet(s"$dir/mob").count() == 1)
    val resolved = MobStore.readResolved(spark, dir)
    assert(resolved.exceptAll(cells).isEmpty && cells.exceptAll(resolved).isEmpty)
  }

  test("NULL-value Puts stay in the main store (never vanish from both branches)") {
    val dir = java.nio.file.Files.createTempDirectory("mob_null").toString
    import spark.implicits._
    val cells = CellTable.toCells(
      Seq((1L, "B" * 400), (2L, null.asInstanceOf[String])).toDF("id", "payload"),
      Seq("id"), "blobs", lit(CellTable.BaseTs))
    MobStore.writeMob(cells, dir, Threshold)
    val resolved = MobStore.readResolved(spark, dir)
    assert(resolved.count() == 2)
    assert(resolved.exceptAll(cells).isEmpty && cells.exceptAll(resolved).isEmpty)
  }

  test("mob stats account for refs, plain cells, and dedup") {
    val dir = java.nio.file.Files.createTempDirectory("mob_stats").toString
    MobStore.writeMob(docCells, dir, Threshold)
    val s = MobStore.mobStats(spark, dir).collect().head
    assert(s.getAs[Long]("n_refs") > 0)
    assert(s.getAs[Long]("n_blobs") <= s.getAs[Long]("n_refs"))
    assert(s.getAs[Long]("blob_bytes") > s.getAs[Long]("main_bytes") / 10,
      "blob side should carry real weight on this fixture")
  }
}
