package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` payloads
 * with typed metadata, plus decode / feature-extract / frame-sample stages.
 *
 * The Spark-side plumbing (schema, partitioning, batch shape, per-partition
 * decoder reuse) is real and tested; the CODEC ITSELF IS A STUB — this
 * container ships no image/audio libraries, so `decodeStub` derives a
 * deterministic fake feature vector from the payload bytes. Swapping in a
 * real decoder changes ONLY the body of [[MultimodalOps.fakeDecode]]
 * (mapPartitions batch shape, schema and downstream stay identical).
 */
object MultimodalOps {

  final case class Media(media_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 features: Array[Float])

  /** Deterministic synthetic media table (payload = seeded pseudo-random bytes). */
  def syntheticMedia(spark: SparkSession, n: Long, payloadBytes: Int = 4096): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      it.map { id =>
        val rng = new scala.util.Random(42L + id) // per-row seed → partition-order independent
        val payload = new Array[Byte](payloadBytes)
        rng.nextBytes(payload)
        val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        Media(id, kind, payload,
          width = if (kind == "image") 64 + (id % 8).toInt * 32 else 0,
          height = if (kind == "image") 64 + (id % 5).toInt * 32 else 0,
          sample_rate = if (kind == "audio") 16000 else 0,
          duration_ms = if (kind != "image") 1000 + id % 9000 else 0)
      }
    }
  }

  /**
   * STUB decode: a real implementation would decode the codec here (JPEG/
   * FLAC/H.264) — everything around it (mapPartitions batching, per-partition
   * decoder state, output schema) is the production shape.
   */
  def fakeDecode(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    // deterministic byte-histogram "embedding" standing in for decoded features
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) % dim) += 1.0f
      i += 1
    }
    val norm = math.sqrt(hist.map(x => x * x).sum).toFloat max 1e-9f
    hist.map(_ / norm)
  }

  /** Feature extraction: per-partition decoder, payload never shuffled after. */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (real codecs are expensive to open)
      it.map(m => MediaFeatures(m.media_id, m.kind, m.payload.length, fakeDecode(m.payload, dim)))
    }
  }

  /**
   * Frame sampling for video rows: emit every `stride`-th 256-byte block as a
   * "frame" (stub for real frame extraction). Catalyst-side slicing — the
   * payload column is pruned away right after, so downstream stages never
   * carry the binary.
   */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0), floor(length(col("payload")) / lit(256 * stride)).cast("int") - 1),
          i => substring(col("payload"), (i * 256 * stride + 1).cast("int"), lit(256)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .withColumn("frame_hash", xxhash64(col("frame_bytes")))
      .drop("frame_bytes")
  }
}
