package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. */
final case class MediaMeta(modality: String, mimeType: String, declaredBytes: Long)

/** One multimodal row: media as an opaque binary column + typed metadata
  * (the recommended 100 TB pattern: never decode at scan time, keep payloads
  * columnar/pruned, decode in a batch-shaped per-partition pass). */
final case class MediaRow(id: Long, meta: MediaMeta, payload: Array[Byte])

/** Extracted features. Real decoders (image/audio/video) are NOT available
  * in this container — [[decodeStub]] is a clearly-marked deterministic fake
  * standing in for the decode kernel; everything around it (schema,
  * partitioning, batch shape, feature plumbing) is real and tested. */
final case class MediaFeatures(
    id: Long,
    modality: String,
    payloadLen: Long,
    nChunks: Long,
    firstByte: Int,
    byteChecksum: Long
)

object Multimodal {

  /** Rows from the documents table: payload = utf-8 bytes standing in for
    * image/audio bytes; metadata typed. */
  def mediaRows(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        MediaRow(id, MediaMeta("image", "application/octet-stream", bytes.length.toLong), bytes)
      }
  }

  /** STUB decode kernel — deterministic fake for the image/audio decoder
    * that is not present in this container. At production scale this is the
    * only place a real codec (libjpeg/ffmpeg via JNI, or `mapInPandas` with
    * PIL on PySpark) plugs in; the call shape (whole partition in, iterator
    * out, fixed CHUNK batching) is the real contract. */
  private final val Chunk = 256

  def decodeStub(payload: Array[Byte]): (Long, Int, Long) = {
    // ??? real decoder goes here; deterministic fake features instead:
    val nChunks = (payload.length + Chunk - 1) / Chunk
    val first = if (payload.isEmpty) -1 else payload(0) & 0xff
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = (sum + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    (nChunks.toLong, first, sum)
  }

  /** Batch feature extraction: one partition at a time, payload-local. */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val (nChunks, first, sum) = decodeStub(r.payload)
        MediaFeatures(r.id, r.meta.modality, r.payload.length.toLong, nChunks, first, sum)
      }
    }
  }

  /** One sampled frame of an opaque payload. */
  final case class Frame(id: Long, frameIdx: Int, frameLen: Int, frameChecksum: Long)

  final val FrameBytes = 64
  final val FrameStride = 4

  /** Frame sampling (the video-ish operator): split each payload into
    * fixed [[FrameBytes]] frames and keep every [[FrameStride]]-th one —
    * a one-to-many mapPartitions pass, payload-local, zero shuffle (the
    * real video decoder would replace the per-frame kernel; the frame
    * arithmetic, batch shape, and output schema are the actual contract). */
  def sampleFrames(rows: Dataset[MediaRow]): Dataset[Frame] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val p = r.payload
        val nFrames = (p.length + FrameBytes - 1) / FrameBytes
        (0 until nFrames).iterator
          .filter(_ % FrameStride == 0)
          .map { f =>
            val from = f * FrameBytes
            val until = math.min(from + FrameBytes, p.length)
            var sum = 0L
            var i = from
            while (i < until) { sum = (sum + (p(i) & 0xff)) % 1000000007L; i += 1 }
            Frame(r.id, f, until - from, sum)
          }
      }
    }
  }
}
