package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Images/audio/video are carried as opaque `binary` columns plus typed
  * metadata, processed per-partition in batches. The actual media decode
  * is STUBBED (no image/audio libraries in this environment) behind
  * [[MediaCodec]]: a deterministic fake container format ("GRFT") whose
  * header encodes width/height/frames, so the Spark-side contract — schema,
  * binary transport, partition-batched decode, frame sampling, feature
  * extraction shape — is real and tested. Swapping [[MediaCodec]] for a JNI
  * or Arrow-UDF decoder changes no plumbing.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class MediaMeta(
      media_id: Long, kind: String, width: Int, height: Int,
      frames: Int, size_bytes: Long, valid: Boolean)
  final case class MediaFeature(
      media_id: Long, frame: Int, feature: Array[Float])

  /** STUB codec for the fake "GRFT" container:
    * bytes = "GRFT" ++ kindByte ++ int32(width) ++ int32(height) ++
    * int32(frames) ++ payload. A real deployment replaces this object. */
  object MediaCodec {
    val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")

    def encode(kind: String, w: Int, h: Int, frames: Int,
        payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 1 + 12 + payload.length)
      bb.put(Magic).put(kind.head.toByte).putInt(w).putInt(h).putInt(frames)
        .put(payload)
      bb.array()
    }

    def decodeHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes == null || bytes.length < 17) return None
      if (!bytes.take(4).sameElements(Magic)) return None
      val bb = java.nio.ByteBuffer.wrap(bytes, 5, 12)
      Some((bb.getInt, bb.getInt, bb.getInt))
    }

    /** Deterministic per-frame "feature": a dim-8 float vector derived from
      * a rolling hash of the frame's payload slice. Stands in for a real
      * image/audio embedding model. */
    def frameFeature(bytes: Array[Byte], frame: Int, dim: Int = 8): Array[Float] = {
      val seed = java.util.Arrays.hashCode(bytes) * 31 + frame
      Array.tabulate(dim)(d => (((seed * 1103515245 + d * 12345) >>> 16) % 1000) / 1000.0f)
    }
  }

  /** Deterministic synthetic media table (the generator for tests/bench). */
  def synthesize(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 16 + (i % 7).toInt * 16
      val h = 16 + (i % 5).toInt * 16
      val frames = if (kind == "video") 1 + (i % 4).toInt else 1
      val payload = Array.tabulate(32)(b => ((i * 131 + b * 7) % 251).toByte)
      MediaRow(i, kind, MediaCodec.encode(kind, w, h, frames, payload))
    }
  }

  /** Partition-batched metadata decode (mapPartitions: one codec context per
    * partition, the same shape a real decoder needs). Invalid blobs yield
    * valid=false rows rather than failing the job. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaCodec.decodeHeader(m.bytes) match {
          case Some((w, h, f)) =>
            MediaMeta(m.media_id, m.kind, w, h, f,
              if (m.bytes == null) 0L else m.bytes.length.toLong, valid = true)
          case None =>
            MediaMeta(m.media_id, m.kind, 0, 0, 0,
              if (m.bytes == null) 0L else m.bytes.length.toLong, valid = false)
        }
      }
    }
  }

  /** Deterministic frame sampling: every `stride`-th frame index (always
    * including frame 0) exploded to one row per sampled frame, with the
    * stub feature vector. Partition-parallel, no shuffle. */
  def sampleFrameFeatures(
      media: Dataset[MediaRow], stride: Int): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        MediaCodec.decodeHeader(m.bytes) match {
          case Some((_, _, frames)) =>
            (0 until frames by stride).iterator.map { f =>
              MediaFeature(m.media_id, f, MediaCodec.frameFeature(m.bytes, f))
            }
          case None => Iterator.empty
        }
      }
    }
  }

  /** Typed metadata stats per kind — the downstream-facing summary. */
  def statsByKind(meta: Dataset[MediaMeta]): DataFrame =
    meta.toDF().groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum(when(col("valid"), 1).otherwise(0)).as("n_valid"),
      max("width").as("max_width"),
      max("height").as("max_height"),
      sum("frames").as("total_frames"),
      sum("size_bytes").as("total_bytes"))
}
