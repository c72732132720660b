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

  test("real codecs: planted PNG and WAV decode; corrupt bytes hit the error channel") {
    import spark.implicits._
    // a real 7x5 RGB PNG, rendered in memory
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 7).foreach(x => (0 until 5).foreach(y =>
      img.setRGB(x, y, (x * 40) << 16 | (y * 50) << 8)))
    val pngOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngOut)
    val png = pngOut.toByteArray

    // a real 1-channel 16-bit WAV: 8000 frames at 8 kHz = exactly 1000 ms
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = Array.fill[Byte](8000 * 2)(0)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 8000L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)
    val wav = wavOut.toByteArray

    val corrupt = "this is not an image".getBytes("UTF-8")
    val media = Seq(
      (1L, "image", png, "s"),
      (2L, "audio", wav, "s"),
      (3L, "image", corrupt, "s"),       // undecodable -> error row
      (4L, "image", png.take(20), "s"))  // truncated PNG -> error row
      .toDF("media_id", "kind", "content", "source")

    val out = Multimodal.decodeMeta(media, realCodecs = true).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(1L).ok && out(1L).width == 7 && out(1L).height == 5 &&
      out(1L).channels == 3, s"png meta: ${out(1L)}")
    assert(out(2L).ok && out(2L).channels == 1 && out(2L).duration_ms == 1000L,
      s"wav meta: ${out(2L)}")
    assert(!out(3L).ok && out(3L).error != null, s"corrupt must error: ${out(3L)}")
    assert(!out(4L).ok, s"truncated must error: ${out(4L)}")

    // the stub tier is untouched by the real-codec flag (oracle stability)
    val stub = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(stub(1L).ok && stub(3L).ok, "stub decodes any non-empty payload")
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
