package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns next to typed metadata,
  * and per-item decode/feature steps run as partition-local transformations
  * over typed Datasets (the JVM analog of `mapInPandas`: one iterator per
  * partition, vectorizable batch shape, no driver round-trips).
  *
  * The actual codec decode is STUBBED (no image/audio libraries in this
  * container): [[MediaCodec.decodeStub]] produces deterministic fake
  * pixels/samples derived from the payload bytes. Everything around it —
  * schemas, partitioning, batch iteration, output shapes — is real and
  * tested, so swapping in a real codec changes one function.
  *
  * Scale notes: payloads never pass through a shuffle here — all steps are
  * narrow (mapPartitions over the scan). For real pipelines the table is
  * written with a size-bucketed partition column so skewed large videos
  * don't straggle one task; `repartitionBySize` provides that key.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata (FIXTURES-style). */
  case class MediaRow(
      media_id: Long,
      kind: String,       // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      byte_histogram: Array[Long], // 16 bins
      mean_byte: Double,
      decoded_checksum: Long)     // checksum over the (stub-)decoded signal

  /** Deterministic synthetic media table — the fixture generator. */
  def sampleMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 64 + (i * 37 % 192).toInt
      val payload = Array.tabulate[Byte](len)(j => ((i * 131 + j * 7) % 256).toByte)
      MediaRow(i, kind, payload,
        width = 16 + (i % 16).toInt, height = 16 + (i % 9).toInt,
        sample_rate = 8000, n_frames = 1 + (i % 30).toInt)
    }
  }

  /** ??? in spirit — the codec boundary. Deterministic fake "decode":
    * expands payload bytes into an unsigned-int signal. A real build
    * replaces this body with an actual image/audio decoder; signature and
    * call sites stay fixed. */
  object MediaCodec {
    def decodeStub(payload: Array[Byte]): Array[Int] =
      payload.map(b => b & 0xff)
  }

  /** Partition-local feature extraction (the mapInPandas analog):
    * histogram + mean + checksum over the decoded signal. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val signal = MediaCodec.decodeStub(r.payload)
        val hist = new Array[Long](16)
        var sum = 0L
        var checksum = 1L
        signal.foreach { v =>
          hist(v >> 4) += 1
          sum += v
          checksum = (checksum * 31 + v) % 1000000007L
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length, hist,
          if (signal.isEmpty) 0.0 else sum.toDouble / signal.length, checksum)
      }
    }
  }

  /** "Resize" plumbing: byte-range truncation standing in for a pixel
    * resample — the real version decodes, resamples, re-encodes. Narrow. */
  def resizePayload(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(payload = r.payload.take(maxBytes)))
  }

  /** Frame sampling for video rows: stride-slice the decoded signal into
    * every k-th "frame" (fixed frame stride stands in for codec frame
    * boundaries). Non-video rows pass through unchanged. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind != "video") r
      else {
        val chunks = r.payload
          .grouped(math.max(1, r.payload.length / math.max(1, r.n_frames)))
          .zipWithIndex.collect { case (frame, idx) if idx % everyK == 0 => frame }
          .toArray
        // n_frames reports the chunks actually kept (chunking may not divide
        // the payload evenly, so deriving it from the old count drifts)
        r.copy(payload = chunks.flatten, n_frames = chunks.length)
      }
    }
  }

  /** Size-bucketed repartition key so heavyweight payloads spread across
    * tasks instead of stacking in one partition at scale. */
  def repartitionBySize(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions, pmod(xxhash64(col("media_id"), length(col("payload"))), lit(partitions)))
}
