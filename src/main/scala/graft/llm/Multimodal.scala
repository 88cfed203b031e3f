package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition in batches.
  *
  * The IMAGE and AUDIO arms are REAL codec paths: [[mediaTableReal]]
  * synthesizes deterministic PNG/BMP payloads (javax.imageio) and PCM
  * WAV payloads (javax.sound.sampled) — both JDK, no external
  * dependency — and [[decode]] runs `ImageIO.read` / an
  * `AudioInputStream` decode on the actual bytes, so
  * width/height/rate/frames/checksum come out of the codecs, not out of
  * arithmetic on byte length. A VIDEO codec is NOT in this environment,
  * so that arm remains a clearly-marked deterministic byte-level
  * stand-in — but the Spark-side contract is identical for all three: binary payload column, typed metadata struct, mapPartitions
  * batch processing (the Scala analog of mapInPandas: one iterator per
  * partition, amortized per-batch setup), and a schema that survives
  * column pruning (metadata reads never touch payload bytes).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])
  case class DecodedMedia(doc_id: Long, modality: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long,
      feature: Array[Float])

  /** Synthesize a media table from documents: payload = UTF-8 bytes of the
    * text (deterministic stand-in for real image/audio bytes). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("modality"),
      col("text").cast(BinaryType).as("payload"))

  /** Pure-SQL metadata extraction (arithmetic on byte length only — never
    * deserializes the payload; pruning-friendly). */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("modality"),
      octet_length(col("payload")).as("byte_len"))
      .withColumn("width", lit(320) + col("byte_len") % 320)
      .withColumn("height", lit(240) + col("byte_len") % 240)
      .withColumn("n_frames", lit(1) + col("byte_len") % 16)

  /** Metadata-only frame sampling for video media: emit every `stride`-th
    * frame index with its byte offset — pure arithmetic on the metadata
    * columns. Unlike [[sampleFrames]] (the typed Dataset plumbing demo,
    * which deserializes payload rows), the payload column is never
    * referenced, so column pruning keeps it out of the scan entirely;
    * that is the point of the pattern: at 100 TB, frame selection runs on
    * metadata alone and only the SELECTED frames' byte ranges are fetched
    * and decoded downstream. Frame offset models a fixed-size-frame
    * container (byte_len div n_frames per frame). */
  def sampleFrameOffsets(media: DataFrame, stride: Int): DataFrame =
    metadata(media)
      .filter(col("modality") === "video")
      .select(col("doc_id"), col("byte_len"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * expr("byte_len div n_frames"))
          .cast(LongType).as("frame_offset"))

  /** PNG magic (8 bytes) and BMP magic (2 bytes) — used to route a
    * payload to the real image codec without trusting the modality tag. */
  private val PngMagic = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)
  private def looksLikeImage(p: Array[Byte]): Boolean =
    (p.length >= 8 && p.take(8).sameElements(PngMagic)) ||
      (p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte)

  /** RIFF/WAVE container magic — routes a payload to the real audio
    * codec without trusting the modality tag. */
  private def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte && p(3) == 'F'.toByte &&
      p(8) == 'W'.toByte && p(9) == 'A'.toByte &&
      p(10) == 'V'.toByte && p(11) == 'E'.toByte

  /** Deterministic synthetic image: dimensions and pixel pattern are pure
    * functions of doc_id, encoded through the REAL JDK codec (PNG for
    * even ids, BMP for odd — both lossless for TYPE_INT_RGB, so a decode
    * recovers the exact pixels). Kept small (≤ 31×23) so per-row encode
    * cost stays microseconds at bench scale. */
  def encodeImagePayload(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 24).toInt
    val h = 8 + (docId % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 31 + y * 7 + docId * 13) % 256).toInt
        val g = ((x * 17 + y * 29 + docId * 5) % 256).toInt
        val b = ((x * 11 + y * 13 + docId * 3) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val fmt = if (docId % 2 == 0) "png" else "bmp"
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic audio: 16-bit little-endian mono PCM whose
    * sample rate, length, and waveform are pure functions of doc_id,
    * wrapped in a REAL WAV container by `javax.sound.sampled` (JDK — no
    * external dependency). A decode recovers the exact samples (PCM is
    * lossless), so rate/frames/checksum can be pinned against the
    * generating formula. Kept short (≤ 767 frames) so per-row encode
    * cost stays microseconds at bench scale. */
  def encodeAudioPayload(docId: Long): Array[Byte] = {
    val rates = Array(8000, 11025, 16000, 22050)
    val rate = rates((docId % 4).toInt)
    val n = 256 + (docId % 512).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = audioSample(docId, i)
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The PCM sample formula (public so the spec can recompute the
    * expected checksum independently of the codec round-trip). */
  def audioSample(docId: Long, i: Int): Int =
    (((i * (3 + docId % 7) + docId * 31) % 65536) - 32768).toInt

  /** Media table with REAL image and audio payloads: image-modality rows
    * (doc_id % 3 == 0) carry actual PNG/BMP bytes from
    * [[encodeImagePayload]], audio rows (doc_id % 3 == 1) carry actual
    * PCM WAV bytes from [[encodeAudioPayload]]; video rows keep the
    * UTF-8 stand-in (no video codec in this environment). Built as a
    * typed map (codec work is per-row JVM code, not SQL). */
  def mediaTableReal(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val modality = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          val payload = modality match {
            case "image" => encodeImagePayload(id)
            case "audio" => encodeAudioPayload(id)
            case _ =>
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          MediaRecord(id, modality, payload)
        }
      }
  }

  /** Single-record decode shared by [[decode]] and [[decodeBatched]].
    *
    * IMAGE: a genuine `ImageIO.read` over the payload bytes —
    * width/height are the codec's, checksum is the sum of decoded 24-bit
    * RGB pixel values, and the 8-dim feature is the mean luminance of 8
    * horizontal bands (all derived from real decoded pixels).
    *
    * AUDIO: a genuine `javax.sound.sampled` WAV decode — sample rate /
    * bits / frame count are the codec's, checksum is the sum of decoded
    * 16-bit samples, feature is per-band mean |amplitude|.
    *
    * VIDEO: no codec in this environment — deterministic
    * byte-level stand-in (documented stub): dims/frames from byte-length
    * arithmetic, checksum = sum of unsigned bytes, feature = per-slice
    * mean byte value. The batch/partition plumbing is identical either
    * way, which is the part that matters at 100 TB. */
  private def decodeOne(r: MediaRecord): DecodedMedia = {
    val len = r.payload.length
    if (r.modality == "image" && looksLikeImage(r.payload)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      val w = img.getWidth; val h = img.getHeight
      var checksum = 0L
      val bandLum = new Array[Double](8)
      val bandCnt = new Array[Long](8)
      var y = 0
      while (y < h) {
        val band = math.min(y * 8 / h, 7)
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y) & 0xFFFFFF
          checksum += rgb
          val lum = 0.299 * ((rgb >> 16) & 0xFF) +
            0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          bandLum(band) += lum
          bandCnt(band) += 1
          x += 1
        }
        y += 1
      }
      val feature = Array.tabulate(8) { i =>
        if (bandCnt(i) == 0) 0f
        else (bandLum(i) / (255.0 * bandCnt(i))).toFloat
      }
      DecodedMedia(r.doc_id, r.modality, len, w, h, 1, checksum, feature)
    } else if (r.modality == "audio" && looksLikeWav(r.payload)) {
      // AUDIO: a genuine javax.sound.sampled decode of the WAV container
      // — sample rate and frame count are the codec's, checksum is the
      // sum of decoded 16-bit samples, and the 8-dim feature is the mean
      // normalized |amplitude| of 8 time bands. Column mapping: width =
      // sample rate (Hz), height = bits per sample, n_frames = PCM frame
      // count.
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = ais.getFormat
      val nFrames = ais.getFrameLength.toInt
      val pcm = ais.readAllBytes()
      ais.close()
      val n = pcm.length / 2
      var checksum = 0L
      val bandAmp = new Array[Double](8)
      val bandCnt = new Array[Long](8)
      var i = 0
      while (i < n) {
        // 16-bit little-endian signed, as encoded
        val s = (((pcm(2 * i + 1) & 0xFF) << 8) | (pcm(2 * i) & 0xFF))
          .toShort.toInt
        checksum += s
        val band = math.min(i * 8 / math.max(n, 1), 7)
        bandAmp(band) += math.abs(s)
        bandCnt(band) += 1
        i += 1
      }
      val feature = Array.tabulate(8) { b =>
        if (bandCnt(b) == 0) 0f
        else (bandAmp(b) / (32768.0 * bandCnt(b))).toFloat
      }
      DecodedMedia(r.doc_id, r.modality, len, fmt.getSampleRate.toInt,
        fmt.getSampleSizeInBits, nFrames, checksum, feature)
    } else {
      // >>> video codec would run here; stand-in below <<<
      var checksum = 0L
      var i = 0
      while (i < len) { checksum += (r.payload(i) & 0xFF); i += 1 }
      val feature = Array.tabulate(8) { i =>
        val slice = r.payload.drop(i * len / 8).take(len / 8)
        if (slice.isEmpty) 0f
        else slice.map(_.toInt & 0xff).sum.toFloat / (255f * slice.length)
      }
      DecodedMedia(r.doc_id, r.modality, len,
        320 + len % 320, 240 + len % 240, 1 + len % 16, checksum, feature)
    }
  }

  /** Per-row decode: real ImageIO for images, documented stand-in for
    * audio/video (see [[decodeOne]]). Codec init amortizes per
    * partition. */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // codec init happens once per partition here (ImageIO registry
      // lookup is JVM-static, so per-partition cost is already ~zero)
      batch.map(decodeOne)
    }
  }

  /** Batched decode — the exact `mapInPandas` batch shape: the partition
    * iterator is chopped into fixed-size batches and the codec is
    * invoked over a materialized array, the way a vectorized codec /
    * model-inference call amortizes at scale (`grouped(batchSize)` ≙
    * pandas' batch slices; lazy between batches, so only one batch is
    * resident per task). Results are identical to the per-row decode —
    * pinned in OutOfBandSpec. */
  def decodeBatched(media: Dataset[MediaRecord], batchSize: Int)
      : Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one vectorized codec call per batch would go here
        batch.map(decodeOne)
      }
    }
  }

  /** Frame sampling: every nth byte-block of the payload as a "frame"
    * (slice plumbing is real; decode is the stub above). */
  def sampleFrames(media: Dataset[MediaRecord], every: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = 1 + r.payload.length % 16
      (0 until n by every).map(i => (r.doc_id, i, r.payload.length / math.max(n, 1)))
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }
}
