package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition in batches.
  *
  * The actual codecs are NOT in this environment, so `decodeStub` is a
  * clearly-marked deterministic fake — but the Spark-side contract is
  * real: binary payload column, typed metadata struct, mapPartitions
  * batch processing (the Scala analog of mapInPandas: one iterator per
  * partition, amortized per-batch setup), and a schema that survives
  * column pruning (metadata reads never touch payload bytes).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])
  case class DecodedMedia(doc_id: Long, modality: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

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

  /** STUB decode: a real implementation would call an image/audio codec
    * here (per partition, so codec init is amortized). The fake derives
    * an 8-dim "feature" from payload bytes deterministically. */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // >>> codec init would happen once per partition here <<<
      batch.map { r =>
        val len = r.payload.length
        val feature = Array.tabulate(8) { i =>
          // deterministic fake of a codec's feature output
          val slice = r.payload.drop(i * len / 8).take(len / 8)
          if (slice.isEmpty) 0f
          else slice.map(_.toInt & 0xff).sum.toFloat / (255f * slice.length)
        }
        DecodedMedia(r.doc_id, r.modality, len,
          320 + len % 320, 240 + len % 240, 1 + len % 16, feature)
      }
    }
  }

  /** Batched decode — the exact `mapInPandas` batch shape: the partition
    * iterator is chopped into fixed-size batches and the (stub) codec is
    * invoked ONCE PER BATCH over a materialized array, the way a
    * vectorized codec / model-inference call amortizes at scale
    * (`grouped(batchSize)` ≙ pandas' batch slices; lazy between batches,
    * so only one batch is resident per task). Results are identical to
    * the per-row stub — pinned in OutOfBandSpec. */
  def decodeBatched(media: Dataset[MediaRecord], batchSize: Int)
      : Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // >>> codec init once per partition here <<<
      it.grouped(batchSize).flatMap { batch =>
        // >>> one vectorized codec call per batch here <<<
        batch.map { r =>
          val len = r.payload.length
          val feature = Array.tabulate(8) { i =>
            val slice = r.payload.drop(i * len / 8).take(len / 8)
            if (slice.isEmpty) 0f
            else slice.map(_.toInt & 0xff).sum.toFloat / (255f * slice.length)
          }
          DecodedMedia(r.doc_id, r.modality, len,
            320 + len % 320, 240 + len % 240, 1 + len % 16, feature)
        }
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
