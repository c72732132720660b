package graft

import graft.model.CellTable
import graft.operators.{MobStore, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal tier riding the MOB tier: media payloads (the opaque
  * binary column) stored as MOB blobs, read back through resolution, and
  * decoded to metadata identical to the direct path — the composition a
  * 100 TB image/audio corpus actually needs (blob bytes out of the main
  * store, compactions that never rewrite a payload). */
class MediaMobSpec extends AnyFunSuite with SparkTestBase {

  test("media payloads round-trip through MOB and decode identically") {
    val dir = java.nio.file.Files.createTempDirectory("media_mob").toString
    val media = Multimodal.deriveMedia(spark, sf001)

    // media frame → cell frame: one content cell per media row, kind in
    // the qualifier (media metadata as typed columns is the ingest shape)
    val cells = media.select(
      CellTable.bigEndianKey(col("media_id")).as("rowKey"),
      lit("media").as("family"),
      concat(lit("content:"), col("kind")).cast("binary").as("qualifier"),
      lit(CellTable.BaseTs).as("ts"),
      lit("Put").as("cellType"),
      col("content").as("value"))
    // media family MOBs aggressively; other families would stay inline
    MobStore.writeMobPerFamily(cells, dir,
      thresholds = Map("media" -> 64), default = 1 << 20)

    val resolved = MobStore.readResolved(spark, dir)
      .select(
        CellTable.keyToLong(col("rowKey")).as("media_id"),
        regexp_extract(col("qualifier").cast("string"), "content:(.*)", 1).as("kind"),
        col("value").as("content"))

    val viaMob = Multimodal.decodeMeta(resolved).collect()
      .map(m => m.media_id -> m).toMap
    val direct = Multimodal.decodeMeta(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(viaMob.keySet == direct.keySet && viaMob.nonEmpty)
    assert(viaMob.forall { case (id, m) => m == direct(id) },
      "MOB-resolved decode must equal the direct decode")

    // the big payloads really did leave the main store
    val main = MobStore.readMain(spark, dir)
    assert(main.filter(col("cellType") === MobStore.RefType).count() > 0)
    val maxMain = main.agg(max(length(col("value")))).collect().head.getInt(0)
    assert(maxMain < 64 + 64, s"main store still carries $maxMain-byte media values")
  }
}
