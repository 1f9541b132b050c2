package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal-column operators for LLM-training-data pipelines
  * (north star): images/audio/video ride as opaque `binary` columns with
  * typed metadata, and per-media compute runs as partition-local typed
  * transformations.
  *
  * The CODECS ARE STUBBED — this container has no image/audio libraries,
  * so `decodeStub` derives features deterministically from the payload
  * bytes (clearly marked below). Everything AROUND the stub is the real
  * engineering and is tested: the schema, the `Dataset[T]`/`mapPartitions`
  * batch shape (one codec instance per PARTITION, not per row — exactly
  * how a JNI decoder or an inference session is amortized at scale), the
  * 1→N frame-sampling generator, and the driver-oracle-checkable metadata
  * columns.
  *
  * Scale notes: media payloads never shuffle — every operator here is a
  * narrow map/flatMap over the scan; only extracted features (small,
  * fixed-width) flow into joins/aggregations downstream. Partition sizing
  * is controlled by `spark.sql.files.maxPartitionBytes` against the
  * payload column size, not row count.
  */
object Multimodal {

  val FeatureDim = 16

  case class MediaRow(media_id: Long, kind: String, data: Array[Byte])
  case class FeatureRow(media_id: Long, kind: String, n_bytes: Long,
                        feat_dim: Int, features: Array[Float])
  case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic media table derived from `documents` (payload = UTF-8
    * text bytes standing in for encoded media; kind cycles by id). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("data"))

  /** ====== STUB ====== deterministic fake of a media decoder: a rolling
    * byte-mix in place of pixel/sample decoding. A real deployment swaps
    * ONLY this function for an actual codec call; the partition shape,
    * schema and everything downstream are unchanged. */
  private[multimodal] def fakeDecode(data: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var acc = 1469598103934665603L // FNV offset basis — any fixed seed
    var i = 0
    while (i < data.length) {
      acc = (acc ^ (data(i) & 0xffL)) * 1099511628211L
      out(i % FeatureDim) += ((acc >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Decode/feature-extract: one "codec" per partition, batch-iterated.
    * This is the Scala/JVM analog of an arrow-batched pandas UDF. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "data").as[MediaRow]
      .mapPartitions { rows =>
        // ====== STUB ====== a real codec/session is constructed HERE,
        // once per partition, and closed when the iterator drains.
        rows.map { m =>
          val feats = fakeDecode(m.data)
          FeatureRow(m.media_id, m.kind, m.data.length.toLong, FeatureDim, feats)
        }
      }
      .toDF()
  }

  /** Resize (image → image): binary-in/binary-out per-row transform, the
    * shape a real resampler plugs into. The payload transform is a STUB
    * (deterministic byte decimation to a target "resolution"); schema and
    * metadata handling are real: output rows carry the original id/kind,
    * the new payload, and both sizes for audit. */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "data").as[MediaRow]
      .filter(_.kind == "image")
      .map { m =>
        val n = m.data.length
        val resized =
          if (n <= targetBytes) m.data
          else {
            // ====== STUB ====== real resampling happens here; the fake
            // keeps every k-th byte to hit ~targetBytes deterministically
            val step = math.max(1, n / targetBytes)
            m.data.indices.collect { case i if i % step == 0 => m.data(i) }
              .take(targetBytes).toArray
          }
        (m.media_id, m.kind, n.toLong, resized.length.toLong, resized)
      }
      .toDF("media_id", "kind", "orig_bytes", "resized_bytes", "data")
  }

  /** Frame sampling (video → 1..N frame rows): the 1→N generator shape.
    * Frame count is a deterministic function of payload size (STUB for
    * container demuxing); frames are byte slices (STUB for decoded
    * frames). */
  def sampleFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "data").as[MediaRow]
      .filter(_.kind == "video")
      .flatMap { m =>
        val nFrames = (m.data.length % 7) + 1 // ====== STUB ======
        (0 until nFrames).map { i =>
          val step = math.max(1, m.data.length / nFrames)
          val from = math.min(i * step, m.data.length)
          val until = math.min(from + step, m.data.length)
          FrameRow(m.media_id, i, m.data.slice(from, until))
        }
      }
      .toDF()
  }

  /** Oracle-checkable metadata projection of the decode output. */
  def featureSummary(media: DataFrame): DataFrame =
    decodeFeatures(media)
      .select(col("media_id"), col("kind"), col("n_bytes"), col("feat_dim"))
      .orderBy(col("media_id"))

  /** Oracle-checkable frame index table (frame payloads stay engine-side). */
  def frameIndex(media: DataFrame): DataFrame =
    sampleFrames(media)
      .select(col("media_id"), col("frame_idx"))
      .orderBy(col("media_id"), col("frame_idx"))
}
