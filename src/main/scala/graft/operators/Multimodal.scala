package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in distributed batches.
  *
  * The Spark-side machinery (schemas, partition-parallel decode via typed
  * `mapPartitions`, frame sampling as array expressions) is real and
  * tested; the *decoder itself* is a deterministic STUB — byte histograms
  * standing in for an image/audio codec, because no media libraries exist
  * in this environment. Swap [[MultimodalStub.decodeBytes]] for a real
  * codec call and everything else carries over unchanged.
  *
  * Scale: payloads never leave their partition (decode is `mapPartitions`,
  * no shuffle); metadata lives in a separate small struct column so
  * metadata-only queries prune the binary column at the parquet scan.
  */
object Multimodal {

  case class MediaMeta(format: String, n_bytes: Long, n_frames: Int)
  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, features: Seq[Float])

  val FrameBytes = 64

  /** Wrap `documents.text` as an opaque binary payload column with typed
    * metadata — the ingestion step a real pipeline would do for images or
    * audio files.
    */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("format"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        ceil(length(encode(col("text"), "UTF-8")) / lit(FrameBytes.toDouble))
          .cast("int").as("n_frames")).as("meta"))

  /** STUB decoder: 16-bin byte histogram normalized to [0,1].
    * ??? ← a real implementation calls the media codec here. Deterministic
    * so tests and resumed runs agree.
    */
  object MultimodalStub {
    def decodeBytes(payload: Array[Byte]): Seq[Float] = {
      val bins = new Array[Long](16)
      payload.foreach(b => bins((b & 0xff) / 16) += 1)
      val total = math.max(payload.length, 1).toFloat
      bins.map(_ / total).toSeq
    }
  }

  /** Partition-parallel feature extraction over the binary column: typed
    * `mapPartitions` (the Scala analog of a batched pandas-UDF decode) —
    * one decoder instantiation per partition, zero shuffle.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          MediaFeatures(id, MultimodalStub.decodeBytes(payload))
        }
      }
  }

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th one, as pure array expressions (no decode).
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    media.select(
      col("doc_id"),
      // Guard n_frames = 0: Spark's sequence(0, -1) DESCENDS ([0, -1])
      // instead of returning [] — an empty payload must yield zero frames.
      when(
        col("meta.n_frames") > 0,
        transform(
          filter(
            sequence(lit(0), col("meta.n_frames") - 1),
            i => i % stride === 0),
          i => struct(
            i.cast("int").as("frame_idx"),
            col("payload").substr(i.cast("int") * FrameBytes + 1, lit(FrameBytes))
              .as("frame"))))
        .otherwise(array().cast("array<struct<frame_idx:int,frame:binary>>"))
        .as("frames"))
}
