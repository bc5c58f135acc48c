package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The heavy codecs (JPEG/PNG decode, audio resample, video demux) are NOT
  * in this container — the decode step is STUBBED with a deterministic
  * fake (byte-level features). Everything around the stub is the real
  * production shape: schema (binary + metadata struct), per-partition
  * batch processing via mapPartitions (the Scala analog of mapInPandas —
  * one codec instance per partition, streamed rows), and pure column
  * slicing for frame extraction. Swapping the fake for a real codec
  * changes one function body, no plan shape.
  */
object Multimodal {

  /** Media table derived deterministically from documents: the UTF-8 text
    * bytes stand in for an opaque payload; metadata struct carries kind +
    * size the way a real ingest would. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Metadata projection (no payload scan — column pruning drops the
    * binary entirely; at 100 TB this reads only the metadata pages). */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.kind").as("kind"),
      col("meta.n_bytes").as("n_bytes"), col("meta.origin").as("origin"))

  /** Fixed-size frame slicing + every-Nth sampling, as pure column
    * expressions (binary substring) — the video frame-sample shape.
    * Emits (media_id, frame_idx, frame md5) per sampled frame. */
  def frameSample(media: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    val nFrames = ceil(col("meta.n_bytes") / lit(frameBytes.toDouble)).cast("int")
    media
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0), nFrames - 1)).as("frame_idx"))
      .where(col("frame_idx") % every === 0)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(expr(s"substring(content, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_md5"))
  }

  case class MediaRow(media_id: Long, content: Array[Byte])
  case class Features(media_id: Long, n_bytes: Long, mean_byte: Double,
      histogram: Array[Long])

  /** Per-partition batched "decode" + feature extraction. REAL plumbing:
    * partition-streamed rows, one decoder context per partition, typed
    * output schema. STUB decode: a real implementation replaces
    * `decodeBytes` with the actual codec call. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaRow]
      .mapPartitions { rows =>
        // one (stub) decoder per partition — where a codec would init
        def decodeBytes(payload: Array[Byte]): Array[Byte] = payload // STUB
        rows.map { r =>
          val decoded = decodeBytes(r.content)
          val hist = new Array[Long](16)
          var sum = 0L
          decoded.foreach { b =>
            val u = b & 0xff
            hist(u / 16) += 1
            sum += u
          }
          // exact IEEE division of two exact integers — bit-identical in
          // any engine that replays the same byte math (no rounding step)
          Features(r.media_id, decoded.length.toLong,
            if (decoded.isEmpty) 0.0 else sum.toDouble / decoded.length,
            hist)
        }
      }.toDF()
  }
}
