package graft

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

    // the SAME ingest mapping and threshold the declared q_media_mob uses
    MobStore.writeMobPerFamily(Multimodal.mediaCells(media), dir,
      thresholds = Map("media" -> Multimodal.MediaMobThreshold), default = 1 << 20)

    val resolved = Multimodal.mediaFromCells(MobStore.readResolved(spark, dir))

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
    assert(maxMain < Multimodal.MediaMobThreshold + 64,
      s"main store still carries $maxMain-byte media values")
  }

  test("deriveMedia keeps media_id == doc_id — the q_rag_media fusion invariant") {
    // the cross-modal capstone RRF-joins the BM25 leg's doc_id with the
    // media ANN leg's media_id in one id domain; that is only sound while
    // deriveMedia maps doc_id → media_id 1:1 (and every BM25-rankable doc
    // owns a payload, hence a feature vector for mmrSelect's inner joins).
    // A deriveMedia change breaking the mapping must fail HERE, not ship a
    // semantically wrong but hash-green capstone.
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"))
    val media = Multimodal.deriveMedia(spark, sf001)
      .select(col("media_id"), col("content"))
    assert(media.join(docs, col("media_id") === col("doc_id")).count()
      == docs.count(), "media ids must be exactly the document ids")
    assert(media.count() == docs.count(), "1:1, no extra media rows")
    assert(media.filter(col("content").isNull || length(col("content")) === 0)
      .count() == 0, "every media row carries a payload (feature vector exists)")
  }
}
