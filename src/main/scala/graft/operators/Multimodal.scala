package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in distributed batches.
  *
  * Two decoders ship:
  *   - [[PgmDecoder]] — a REAL decoder for binary PGM (netpbm "P5"), the
  *     minimal raster format: ASCII header (magic, dims, maxval, with
  *     `#` comments and arbitrary whitespace per the spec) followed by a
  *     raw byte raster. Pure JVM, no media libraries, deterministic.
  *   - [[MultimodalStub.decodeBytes]] — a 16-bin byte histogram standing
  *     in for codecs whose libraries don't exist in this environment
  *     (JPEG/PNG/audio); swap in a real codec call and everything else
  *     carries over unchanged.
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

  /** Wrap each document as a REAL binary PGM image — a 1-row grayscale
    * strip whose pixels are the document's bytes — including a `#`
    * comment line so round-trips exercise the parser's comment handling.
    * The payload is built with codegen'd expressions (binary `concat`),
    * never a UDF.
    */
  def toPgm(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        encode(
          concat(
            lit("P5\n# graft doc "), col("doc_id").cast("string"), lit("\n"),
            length(encode(col("text"), "UTF-8")).cast("string"), lit(" 1\n255\n")),
          "UTF-8"),
        encode(col("text"), "UTF-8")).as("payload"),
      struct(
        lit("image/x-portable-graymap").as("format"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        lit(1).as("n_frames")).as("meta"))

  case class PgmFeatures(
      doc_id: Long, width: Int, height: Int, max_val: Int,
      n_px: Long, mean_px: Option[Double], min_px: Option[Int], max_px: Option[Int])

  /** Minimal-but-real decoder for binary PGM ("P5"), the netpbm raw
    * graymap: `P5`, then width/height/maxval as ASCII decimals separated
    * by whitespace (with `#`-to-newline comments allowed between tokens),
    * then EXACTLY ONE whitespace byte, then the `width*height` raw byte
    * raster (maxval ≤ 255 ⇒ one byte per pixel). Malformed input throws
    * rather than returning garbage features.
    */
  object PgmDecoder {
    def decode(docId: Long, b: Array[Byte]): PgmFeatures = {
      require(b.length >= 2 && b(0) == 'P' && b(1) == '5',
        s"doc $docId: not a binary PGM (missing P5 magic)")
      var i = 2
      def skipSeparators(): Unit = {
        var scanning = true
        while (scanning && i < b.length) {
          val c = b(i)
          if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
          else scanning = false
        }
      }
      def readAsciiInt(what: String): Int = {
        skipSeparators()
        require(i < b.length && b(i) >= '0' && b(i) <= '9',
          s"doc $docId: expected ASCII integer for $what at byte $i")
        var v = 0
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          v = v * 10 + (b(i) - '0'); i += 1
        }
        v
      }
      val width = readAsciiInt("width")
      val height = readAsciiInt("height")
      val maxVal = readAsciiInt("maxval")
      require(maxVal > 0 && maxVal <= 255,
        s"doc $docId: maxval $maxVal outside the one-byte-per-pixel range")
      require(i < b.length &&
        (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r'),
        s"doc $docId: missing the single whitespace byte before the raster")
      i += 1
      val nPx = width.toLong * height
      require(b.length - i >= nPx,
        s"doc $docId: raster truncated (${b.length - i} bytes for $nPx pixels)")
      if (nPx == 0) PgmFeatures(docId, width, height, maxVal, 0L, None, None, None)
      else {
        var sum = 0L; var lo = 255; var hi = 0; var j = i
        val end = i + nPx.toInt
        while (j < end) {
          val px = b(j) & 0xff
          sum += px
          if (px < lo) lo = px
          if (px > hi) hi = px
          j += 1
        }
        PgmFeatures(docId, width, height, maxVal, nPx,
          Some(sum.toDouble / nPx.toDouble), Some(lo), Some(hi))
      }
    }
  }

  /** Partition-parallel REAL decode of a PGM payload column: header
    * parsed, raster reduced to pixel moments — one decoder pass per
    * partition, zero shuffle, same batch shape a pandas-UDF image decode
    * would use.
    */
  def decodePgmFeatures(spark: SparkSession, media: DataFrame): Dataset[PgmFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => PgmDecoder.decode(id, payload) })
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
