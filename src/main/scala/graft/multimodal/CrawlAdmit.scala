package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{DedupIndex, MediaIndex, VideoIndex}

/** COMPOSED multimodal crawl admission (r14 verdict "what's missing"
  * #4): one call gates a crawl batch carrying text + image + audio +
  * video renditions through every modality's stored-index admission
  * gate and returns per-item flags — the media analog of
  * q_curation_pipeline's composed text gates, and the single entry a
  * crawler's ingest loop calls instead of four hand-wired ones.
  *
  * Shape at 100 TB: each modality's gate is the family's broadcast-batch
  * plan (fresh side derived once, |batch|-bounded, broadcast; stored
  * side streams map-side; exchanges match-bounded) — composing them
  * changes NOTHING about any one gate's economics, and the four gates
  * share the single checkpointed batch so payloads are read once per
  * modality's encoder. [[admitBatch]] additionally appends each
  * family's OWN admitted rows (per-modality admission: a novel text
  * whose image is a known dup enters the text index but not the image
  * index — the curation semantics of modality-scoped dedup), so the
  * next batch gates against corpus ∪ admitted with no rebuild. */
object CrawlAdmit {

  /** The registered fixture batch: a verbatim re-fetch of the
    * doc_id % 4 = 1 slice (+1M ids — every modality refuses it) and a
    * genuinely novel slice, the doc_id % 4 = 3 docs REVERSED (+2M ids —
    * different shingles, different rasters, different envelopes,
    * different frames: every modality admits it). Pure string surgery,
    * replayed by DuckDB's reverse(). */
  def crawlBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    docs.where(pmod(col("doc_id"), lit(4L)) === 1L)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
      .unionByName(
        docs.where(pmod(col("doc_id"), lit(4L)) === 3L)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"),
            reverse(col("text")).as("text")))
  }

  /** Per-item admission flags, one row per batch doc:
    * (doc_id, admit_text, admit_image, admit_audio, admit_video, admit)
    * — admit_* ∈ {0, 1} (1 = no stored near-dup in that modality),
    * `admit` = the conjunction. Read-only: derives the batch's four
    * renditions, runs the four gates, mutates nothing. `audioClipIdx`
    * (a [[VideoIndex]]-family segment index) folds EXCERPT refusal into
    * the audio flag: an item embedding stored audio — invisible to the
    * whole-stream fingerprint — refuses when ≥ `minFrames` of its PCM
    * segments match stored segments at one consistent offset within
    * `maxDist`. */
  def admitFlags(spark: SparkSession, batch: DataFrame, textIdx: String,
      imageIdx: String, audioIdx: String, videoIdx: String,
      maxDist: Int = 6, minFrames: Int = 2, tau: Double = 0.8,
      videoPerceptual: Boolean = false,
      audioClipIdx: Option[String] = None,
      imageCropIdx: Option[String] = None): DataFrame = {
    val b = batch.select(col("doc_id"), col("text")).localCheckpoint()
    flagsFrom(spark, b,
      Multimodal.imageDHash(Multimodal.imageTableOf(b)),
      Multimodal.audioDHash(Multimodal.audioTableOf(b)),
      Multimodal.videoFramesFp(Multimodal.videoTableOf(b)),
      audioClipIdx.map(_ =>
        Multimodal.audioSegmentsFp(Multimodal.audioTableOf(b))),
      imageCropIdx.map(_ =>
        Multimodal.imageRowsFp(Multimodal.imageTableOf(b))),
      textIdx, imageIdx, audioIdx, videoIdx, maxDist, minFrames, tau,
      videoPerceptual, audioClipIdx, imageCropIdx)
  }

  private def flagsFrom(spark: SparkSession, b: DataFrame,
      imgFp: DataFrame, audFp: DataFrame, vFrames: DataFrame,
      audSeg: Option[DataFrame], imgRows: Option[DataFrame],
      textIdx: String, imageIdx: String, audioIdx: String,
      videoIdx: String, maxDist: Int, minFrames: Int, tau: Double,
      videoPerceptual: Boolean = false,
      audioClipIdx: Option[String] = None,
      imageCropIdx: Option[String] = None): DataFrame = {
    val ids = b.select(col("doc_id"))
    val textAdm = DedupIndex.dedupAgainst(spark, textIdx, b, "text",
      "doc_id", tau = tau).select(col("doc_id"))
    // `imageCropIdx` adds CROP refusal to the image leg (the
    // audioClipIdx discipline over raster rows): a batch item that is
    // a vertical crop / banner edit of stored material slips the
    // whole-image fingerprint but its rows match the stored row index
    // at one consistent vertical offset
    val imgCropRefused = (imageCropIdx zip imgRows).map { case (idx, rw) =>
      VideoIndex.clipPerceptualAgainst(spark, idx, rw, maxDist, minFrames)
        .select(col("fid").as("doc_id")).distinct()
    }
    val imgAdm0 = MediaIndex.dedupAgainst(spark, imageIdx, imgFp, maxDist)
      .select(col("media_id").as("doc_id"))
    val imgAdm = imgCropRefused.fold(imgAdm0)(r =>
      imgAdm0.join(r, Seq("doc_id"), "left_anti"))
    // `audioClipIdx` adds EXCERPT refusal to the audio leg: the
    // whole-stream fingerprint is blind to stored material embedded in
    // (or lifted from) a batch item — every envelope window moves —
    // but the segment grid matches the stored index at a consistent
    // offset (VideoIndex.clipPerceptualAgainst: the index is
    // modality-agnostic over temporal rows, and the perceptual leg
    // catches a re-MASTERED excerpt too, the curation default)
    val audClipRefused = (audioClipIdx zip audSeg).map { case (idx, seg) =>
      VideoIndex.clipPerceptualAgainst(spark, idx, seg, maxDist, minFrames)
        .select(col("fid").as("doc_id")).distinct()
    }
    val audAdm0 = MediaIndex.dedupAgainst(spark, audioIdx, audFp, maxDist)
      .select(col("media_id").as("doc_id"))
    val audAdm = audClipRefused.fold(audAdm0)(r =>
      audAdm0.join(r, Seq("doc_id"), "left_anti"))
    // refusal-set formulation so a frameless (empty) video admits —
    // nothing to dedup is not a dup. `videoPerceptual` swaps the video
    // leg's match semantics from byte-exact frame digests to the
    // banded perceptual fingerprints (a TRANSCODED copy of stored
    // video then refuses too — the curation default at real crawl
    // scale; the registered q_crawl_admit keeps the byte-exact leg its
    // oracle replays)
    val vidRefused = (if (videoPerceptual)
        VideoIndex.perceptualAgainst(spark, videoIdx, vFrames, maxDist,
          minFrames)
      else VideoIndex.pairsAgainst(spark, videoIdx, vFrames, minFrames))
      .select(col("fid").as("doc_id")).distinct()
    def flag(admitted: DataFrame, name: String): DataFrame =
      admitted.withColumn(name, lit(1L))
    ids
      .join(flag(textAdm, "admit_text"), Seq("doc_id"), "left")
      .join(flag(imgAdm, "admit_image"), Seq("doc_id"), "left")
      .join(flag(audAdm, "admit_audio"), Seq("doc_id"), "left")
      .join(flag(ids.join(vidRefused, Seq("doc_id"), "left_anti"),
        "admit_video"), Seq("doc_id"), "left")
      .na.fill(0L, Seq("admit_text", "admit_image", "admit_audio",
        "admit_video"))
      .withColumn("admit",
        (col("admit_text") * col("admit_image") * col("admit_audio")
          * col("admit_video")).cast("long"))
  }

  /** [[admitFlags]] + per-family ingest of each modality's admitted
    * rows ([[graft.streaming.Streams]]' materialize-before-append
    * discipline: the flags frame is checkpointed before any append so
    * a gate never reads its own inserts). The batch's fingerprints are
    * derived ONCE and shared between gating and appending — no payload
    * is decoded twice. Returns the flags. */
  def admitBatch(spark: SparkSession, batch: DataFrame, textIdx: String,
      imageIdx: String, audioIdx: String, videoIdx: String,
      maxDist: Int = 6, minFrames: Int = 2, tau: Double = 0.8,
      videoPerceptual: Boolean = false,
      audioClipIdx: Option[String] = None,
      imageCropIdx: Option[String] = None): DataFrame = {
    val b = batch.select(col("doc_id"), col("text")).localCheckpoint()
    val imgFp = Multimodal.imageDHash(Multimodal.imageTableOf(b))
      .localCheckpoint()
    val audFp = Multimodal.audioDHash(Multimodal.audioTableOf(b))
      .localCheckpoint()
    val vFrames = Multimodal.videoFramesFp(Multimodal.videoTableOf(b))
      .localCheckpoint()
    val audSeg = audioClipIdx.map(_ =>
      Multimodal.audioSegmentsFp(Multimodal.audioTableOf(b))
        .localCheckpoint())
    val imgRows = imageCropIdx.map(_ =>
      Multimodal.imageRowsFp(Multimodal.imageTableOf(b))
        .localCheckpoint())
    val flags = flagsFrom(spark, b, imgFp, audFp, vFrames, audSeg,
      imgRows, textIdx,
      imageIdx, audioIdx, videoIdx, maxDist, minFrames, tau,
      videoPerceptual, audioClipIdx, imageCropIdx)
      .localCheckpoint()
    def adm(c: String): DataFrame =
      flags.where(col(c) === 1L).select(col("doc_id"))
    DedupIndex.append(spark, textIdx,
      b.join(adm("admit_text"), Seq("doc_id")), "text", "doc_id")
    MediaIndex.append(spark, imageIdx, imgFp.join(
      adm("admit_image").withColumnRenamed("doc_id", "media_id"),
      Seq("media_id")))
    MediaIndex.append(spark, audioIdx, audFp.join(
      adm("admit_audio").withColumnRenamed("doc_id", "media_id"),
      Seq("media_id")))
    VideoIndex.append(spark, videoIdx, vFrames.join(
      adm("admit_video").withColumnRenamed("doc_id", "media_id"),
      Seq("media_id")))
    // the excerpt index ingests the audio-admitted items' segments so
    // the next batch's excerpt gate sees corpus ∪ admitted
    (audioClipIdx zip audSeg).foreach { case (idx, seg) =>
      VideoIndex.append(spark, idx, seg.join(
        adm("admit_audio").withColumnRenamed("doc_id", "media_id"),
        Seq("media_id")))
    }
    // likewise the crop index ingests the image-admitted items' rows
    (imageCropIdx zip imgRows).foreach { case (idx, rw) =>
      VideoIndex.append(spark, idx, rw.join(
        adm("admit_image").withColumnRenamed("doc_id", "media_id"),
        Seq("media_id")))
    }
    flags
  }
}
