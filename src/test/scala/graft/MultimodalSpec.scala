package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("media derivation covers all three kinds with non-empty payloads") {
    val media = Multimodal.deriveMedia(spark, sf001)
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(media.filter(length(col("content")) === 0).count() == 0)
  }

  test("decode produces typed metadata; ok for valid payloads, deterministic") {
    val meta1 = Multimodal.decodeQuery(spark, sf001).collect()
    val meta2 = Multimodal.decodeQuery(spark, sf001).collect()
    assert(meta1.map(_.toString).sorted.sameElements(meta2.map(_.toString).sorted))
    assert(meta1.forall(_.getAs[Boolean]("ok")))
    val images = meta1.filter(_.getAs[String]("kind") == "image")
    assert(images.forall(r => r.getAs[Int]("width") >= 64 && r.getAs[Int]("channels") == 3))
    val audio = meta1.filter(_.getAs[String]("kind") == "audio")
    assert(audio.forall(_.getAs[Long]("duration_ms") >= 1000L))
  }

  test("error channel: empty payload becomes ok=false row, not a task failure") {
    import spark.implicits._
    val media = Seq((1L, "image", Array.empty[Byte], "s"),
      (2L, "image", "realbytes".getBytes, "s")).toDF("media_id", "kind", "content", "source")
    val meta = Multimodal.decodeMeta(media).collect()
    val bad = meta.find(_.media_id == 1L).get
    assert(!bad.ok && bad.error.contains("IllegalArgumentException"))
    assert(meta.find(_.media_id == 2L).get.ok)
  }

  test("resize and feature extraction preserve row identity, deterministic") {
    val media = Multimodal.deriveMedia(spark, sf001)
    val resized = Multimodal.resize(media, 224, 224)
    assert(resized.count() == media.count())
    assert(resized.filter(col("width") =!= 224 || col("height") =!= 224).count() == 0)
    assert(resized.filter(length(col("content")) === 0).count() == 0)

    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    val v = feats.orderBy("media_id").limit(1).collect().head.getSeq[Float](1)
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3)
    // deterministic across runs
    val v2 = Multimodal.extractFeatures(media).orderBy("media_id")
      .limit(1).collect().head.getSeq[Float](1)
    assert(v == v2)
  }

  test("media features compose with ANN search") {
    val out = Multimodal.mediaAnnQuery(spark, sf001).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach(rows => assert(rows.length == 10))
  }

  test("frame sampling explodes videos into deterministic frame rows") {
    val frames = Multimodal.frameSampleQuery(spark, sf001)
    val meta = Multimodal.decodeQuery(spark, sf001)
      .filter(col("kind") === "video")
    // one frame per 60s step from 0..duration inclusive
    val expected = meta.select(
      (floor(col("duration_ms") / 60000L) + 1).as("n")).agg(sum("n"))
      .collect().head.getLong(0)
    assert(frames.count() == expected)
    assert(frames.filter(length(col("frame_digest")) =!= 64).count() == 0)
  }
}
