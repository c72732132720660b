package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * `BINARY` columns next to typed metadata, and per-item compute (decode,
 * feature extraction, resize, frame sampling) runs as batched per-partition
 * functions — the Scala analogue of `mapInPandas`, with the same contract:
 * the executor processes an iterator of rows, amortizing codec/library init
 * once per partition.
 *
 * Decode kernels come in two tiers. The DEFAULT is a clearly-marked
 * deterministic STUB (`decodeStub`) deriving plausible metadata from the
 * payload bytes alone — stable for the oracle queries regardless of
 * payload format. `decodeMeta(realCodecs = true)` swaps in the REAL
 * decoders the JRE ships: `javax.imageio` for images (PNG/JPEG/GIF/BMP)
 * and `javax.sound.sampled` for audio (WAV/AIFF/AU); video has no JRE
 * codec and stays stubbed. Both tiers run through the SAME per-partition
 * lifecycle and error channel, so swapping in heavier external codecs is
 * still a one-function change.
 */
object Multimodal {

  /** A multimodal record: payload + typed metadata. */
  final case class Media(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      content: Array[Byte],
      source: String)

  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      duration_ms: Long,
      ok: Boolean,
      error: String)

  /** Derive a deterministic media table from the documents fixture: payload =
    * UTF-8 bytes of the text, kind assigned round-robin by doc id. */
  def deriveMedia(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      col("source"))

  /** MOB threshold for the media family: payloads at or above this ride
    * the blob side table ([[MobStore]]); metadata-size cells stay inline. */
  val MediaMobThreshold = 64

  /** Media frame → MOB-ready cell frame (kind rides the qualifier) — the
    * ONE ingest mapping shared by the declared `q_media_mob` query and
    * MediaMobSpec, so the spec always guards the query's actual shape. */
  def mediaCells(media: DataFrame): DataFrame = {
    import graft.model.CellTable
    media.select(
      CellTable.bigEndianKey(col("media_id")).as("rowKey"),
      lit("media").as("family"),
      concat(lit("content:"), col("kind")).cast("binary").as("qualifier"),
      lit(CellTable.BaseTs).as("ts"),
      lit("Put").as("cellType"),
      col("content").as("value"))
  }

  /** Inverse of [[mediaCells]]: a resolved cell frame back to the media
    * shape [[decodeMeta]] consumes. */
  def mediaFromCells(cells: DataFrame): DataFrame = {
    import graft.model.CellTable
    cells.select(
      CellTable.keyToLong(col("rowKey")).as("media_id"),
      regexp_extract(col("qualifier").cast("string"), "content:(.*)", 1).as("kind"),
      col("value").as("content"))
  }

  /**
   * STUB decode kernel — stands in for an image/audio codec. Deterministic
   * pure function of the payload so tests are stable. A real implementation
   * replaces only this function (same signature: bytes in, metadata out).
   */
  private[operators] def decodeStub(kind: String, content: Array[Byte]): (Int, Int, Int, Long) = {
    val h = graft.functions.SimHashImpl.fnv1a64(content)
    kind match {
      case "image" =>
        (64 + math.floorMod(h, 1856).toInt, 64 + math.floorMod(h >>> 16, 1016).toInt, 3, 0L)
      case "audio" => (0, 0, math.floorMod(h, 2).toInt + 1, 1000L + math.floorMod(h >>> 8, 600000L))
      case _       => (640, 360, 3, 1000L + math.floorMod(h >>> 24, 7200000L))
    }
  }

  /** REAL image decode — `javax.imageio`, present in every JRE. Returns
    * (width, height, bands, 0): bands from the decoded raster (3 RGB,
    * 4 RGBA, 1 gray). `ImageIO.read` signals undecodable input by
    * returning null (unknown container) or throwing (truncated/corrupt
    * stream) — both route to the caller's error channel as exceptions. */
  private[operators] def decodeImageReal(content: Array[Byte]): (Int, Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null) throw new IllegalArgumentException("undecodable image payload")
    (img.getWidth, img.getHeight, img.getRaster.getNumBands, 0L)
  }

  /** REAL audio inspect — `javax.sound.sampled` (WAV/AIFF/AU): channel
    * count and duration from the container header, no sample decode. */
  private[operators] def decodeAudioReal(content: Array[Byte]): (Int, Int, Int, Long) = {
    val fmt = javax.sound.sampled.AudioSystem
      .getAudioFileFormat(new java.io.ByteArrayInputStream(content))
    val durMs =
      if (fmt.getFrameLength > 0 && fmt.getFormat.getFrameRate > 0)
        (fmt.getFrameLength * 1000L / fmt.getFormat.getFrameRate.toDouble).toLong
      else 0L
    (0, 0, fmt.getFormat.getChannels, durMs)
  }

  /**
   * Decode/inspect every payload, batched per partition, with the M4-style
   * error channel: a payload the decoder rejects becomes an `ok=false` row,
   * never a task failure. `realCodecs = true` decodes images with
   * `javax.imageio` and audio headers with `javax.sound.sampled` (video
   * stays stubbed — no JRE codec); the default stub tier is deterministic
   * on arbitrary bytes, which is what the fixture-derived oracle needs.
   */
  def decodeMeta(media: DataFrame, realCodecs: Boolean = false): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.select("media_id", "kind", "content").as(
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
      .mapPartitions { iter =>
        // per-partition codec init (M3): one setting per task, not per row;
        // ImageIO's default file-backed cache would add a disk round-trip
        // per payload
        if (realCodecs) javax.imageio.ImageIO.setUseCache(false)
        iter.map { case (id, kind, content) =>
          try {
            if (content == null || content.isEmpty)
              throw new IllegalArgumentException("empty payload")
            val (w, hgt, ch, dur) = (kind, realCodecs) match {
              case ("image", true) => decodeImageReal(content)
              case ("audio", true) => decodeAudioReal(content)
              case _               => decodeStub(kind, content)
            }
            MediaMeta(id, kind, content.length.toLong, w, hgt, ch, dur, ok = true, null)
          } catch { case e: Exception =>
            MediaMeta(id, kind, if (content == null) 0L else content.length.toLong,
              0, 0, 0, 0L, ok = false, e.getClass.getSimpleName + ": " + e.getMessage)
          }
        }
      }
  }

  /**
   * STUB frame sampling: emit `everyMs`-spaced frame descriptors for video
   * rows — the row-explosion shape (1 video → N frames) that a real sampler
   * produces, with deterministic fake frame payloads (a digest, not pixels).
   */
  def sampleFrames(meta: Dataset[MediaMeta], everyMs: Long): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video" && col("ok"))
      .select(
        col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ts_ms"))
      .select(
        col("media_id"), col("frame_ts_ms"),
        sha2(concat(col("media_id").cast("string"), lit(":"),
          col("frame_ts_ms").cast("string")), 256).as("frame_digest"))

  /**
   * STUB resize: payload → payload transform with updated dimensions. The
   * Spark shape is what matters: a narrow per-partition map over (metadata,
   * payload) pairs producing new binary content — byte-identical layout to
   * a real resampler. The fake "resized" payload is a deterministic digest
   * of (content, target dims).
   */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    implicit val enc = Encoders.tuple(
      Encoders.scalaLong, Encoders.STRING, Encoders.BINARY)
    media.select("media_id", "kind", "content")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
      .mapPartitions { iter =>
        // null/empty payloads are skipped here — they carry nothing to
        // resample; decodeMeta is the surface that reports them (ok=false)
        iter.collect { case (id, kind, content) if content != null && content.nonEmpty =>
          val h = graft.functions.SimHashImpl.fnv1a64(content) ^
            (width.toLong << 32) ^ height.toLong
          val fake = java.nio.ByteBuffer.allocate(8).putLong(h).array()
          (id, kind, fake)
        }
      }
      .toDF("media_id", "kind", "content")
      .withColumn("width", lit(width))
      .withColumn("height", lit(height))
  }

  /**
   * STUB feature extraction: payload → fixed-width float embedding, the
   * output shape an image/audio encoder produces. Deterministic pseudo-
   * features from the payload bytes, unit-normalized so the vectors feed
   * straight into the Similarity/IVF operators.
   */
  final case class MediaFeatures(media_id: Long, embedding: Array[Float])

  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "content")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { iter =>
        // same guard as resize: no payload → no feature vector; the M4
        // error channel for bad payloads is decodeMeta
        iter.collect { case (id, content) if content != null && content.nonEmpty =>
          val base = graft.functions.SimHashImpl.fnv1a64(content)
          val raw = Array.tabulate(dim) { i =>
            val h = graft.functions.MinHashImpl.mix64(base + i)
            (h.toDouble / Long.MaxValue).toFloat
          }
          val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
          MediaFeatures(id, raw.map(x => if (norm == 0) x else x / norm))
        }
      }
      .toDF()
  }

  // Query-pack adapters --------------------------------------------------

  def decodeQuery(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(deriveMedia(spark, sfDir)).toDF()

  def frameSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(decodeMeta(deriveMedia(spark, sfDir)), everyMs = 60000L)

  /** Media features piped into the ANN brute-force search: the multimodal →
    * similarity composition (encode every payload, find its neighbors). */
  def mediaAnnQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = extractFeatures(deriveMedia(spark, sfDir))
      .select(col("media_id").as("vec_id"), col("embedding"))
    Similarity.bruteForceTopK(feats, feats.filter(col("vec_id") < 3), k = 10)
  }
}
