package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.{CrawlAdmit, Multimodal}
import graft.sources.{DedupIndex, MediaIndex, VideoIndex}

/** The composed crawl gate's per-modality semantics on a controlled
  * corpus: a GAIN transcode of stored material is refused by the
  * gain-invariant image/audio fingerprints either way, slips the
  * byte-exact video leg (md5s differ), and is refused by the video leg
  * exactly when the `videoPerceptual` dial is on — while a genuinely
  * novel doc admits everywhere under both dials. */
class CrawlAdmitSpec extends AnyFunSuite {
  import TestSession._

  test("videoPerceptual dial: a gain transcode slips the byte-exact video leg only") {
    val s = spark
    import s.implicits._
    val tA = "the quick brown fox jumps over the lazy dog while seven " +
      "wise owls watch from the old stone bridge at dawn in cold rain"
    val tB = "numbers one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen"
    assert(tA.length >= 96 && tA.forall(_ <= 'z')) // +1 stays ASCII
    val corpus = Seq((1L, tA)).toDF("doc_id", "text")
    DedupIndex.build(spark, corpus, "text", "doc_id", "graft_caspec_text")
    MediaIndex.build(spark,
      Multimodal.imageDHash(Multimodal.imageTableOf(corpus)),
      "graft_caspec_img")
    MediaIndex.build(spark,
      Multimodal.audioDHash(Multimodal.audioTableOf(corpus)),
      "graft_caspec_aud")
    VideoIndex.build(spark,
      Multimodal.videoFramesFp(Multimodal.videoTableOf(corpus)),
      "graft_caspec_vid")
    // the gain transcode: every byte +1 — all three perceptual
    // fingerprint families are invariant (comparisons shift together),
    // every md5 differs
    val batch = Seq((10L, tA.map(c => (c + 1).toChar)), (11L, tB))
      .toDF("doc_id", "text")
    def flags(perc: Boolean): Map[Long, (Long, Long, Long, Long, Long)] =
      CrawlAdmit.admitFlags(spark, batch, "graft_caspec_text",
        "graft_caspec_img", "graft_caspec_aud", "graft_caspec_vid",
        videoPerceptual = perc)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))).toMap
    val exact = flags(perc = false)
    // transcode: text admits (different words), image + audio refuse
    // (gain-invariant dHashes match at dist 0), byte-exact VIDEO leg is
    // blind and admits; conjunction already refuses via image/audio
    assert(exact(10L) == ((1L, 0L, 0L, 1L, 0L)),
      s"byte-exact video leg must be blind to the transcode: ${exact(10L)}")
    assert(exact(11L) == ((1L, 1L, 1L, 1L, 1L)),
      s"the novel doc must admit everywhere: ${exact(11L)}")
    val perc = flags(perc = true)
    assert(perc(10L) == ((1L, 0L, 0L, 0L, 0L)),
      s"the perceptual video leg must refuse the transcode: ${perc(10L)}")
    assert(perc(11L) == ((1L, 1L, 1L, 1L, 1L)),
      "the dial must not change the novel doc's admission")
  }

  test("audioClipIdx dial: an item EMBEDDING stored audio slips the " +
      "whole-stream fingerprint and refuses through the excerpt gate") {
    val s = spark
    import s.implicits._
    // structurally distinct per salt (different multiplier, different
    // quadratic modulus) — an additive salt would be a near-uniform
    // shift of the same sequence, which the gain-INVARIANT gradient
    // fingerprints would rightly match
    def varied(n: Int, salt: Int): String =
      (0 until n).map(i =>
        (33 + (i * (37 + 2 * salt) + (i * i) % (19 + salt)) % 90).toChar)
        .mkString
    val tC = varied(320, 0)
    val corpus = Seq((1L, tC)).toDF("doc_id", "text")
    DedupIndex.build(spark, corpus, "text", "doc_id", "graft_casc_text")
    MediaIndex.build(spark,
      Multimodal.imageDHash(Multimodal.imageTableOf(corpus)),
      "graft_casc_img")
    MediaIndex.build(spark,
      Multimodal.audioDHash(Multimodal.audioTableOf(corpus)),
      "graft_casc_aud")
    VideoIndex.build(spark,
      Multimodal.videoFramesFp(Multimodal.videoTableOf(corpus)),
      "graft_casc_vid")
    VideoIndex.build(spark,
      Multimodal.audioSegmentsFp(Multimodal.audioTableOf(corpus)),
      "graft_casc_ausg")
    // item 20 EMBEDS tC's PCM [64, 192) between novel segment-aligned
    // padding: its whole-stream envelope moves everywhere, but four of
    // its segments match the stored grid at one consistent offset;
    // item 21 shares nothing
    val embedding = varied(64, 7) + tC.substring(64, 192) + varied(64, 13)
    val batch = Seq((20L, embedding), (21L, varied(320, 29)))
      .toDF("doc_id", "text")
    def audioFlag(dial: Option[String]): Map[Long, Long] =
      CrawlAdmit.admitFlags(spark, batch, "graft_casc_text",
        "graft_casc_img", "graft_casc_aud", "graft_casc_vid",
        audioClipIdx = dial)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val off = audioFlag(None)
    assert(off(20L) == 1L,
      "the whole-stream fingerprint must be blind to the embedded excerpt")
    assert(off(21L) == 1L)
    val on = audioFlag(Some("graft_casc_ausg"))
    assert(on(20L) == 0L,
      "the excerpt gate must refuse the item embedding stored audio")
    assert(on(21L) == 1L,
      "the dial must not change the novel item's audio admission")
  }

  test("imageCropIdx dial: a vertical crop of stored material slips " +
      "the whole-image fingerprint and refuses through the crop gate") {
    val s = spark
    import s.implicits._
    def varied(n: Int, salt: Int): String =
      (0 until n).map(i =>
        (33 + (i * (37 + 2 * salt) + (i * i) % (19 + salt)) % 90).toChar)
        .mkString
    val tC = varied(320, 3)
    val corpus = Seq((1L, tC)).toDF("doc_id", "text")
    DedupIndex.build(spark, corpus, "text", "doc_id", "graft_cicr_text")
    MediaIndex.build(spark,
      Multimodal.imageDHash(Multimodal.imageTableOf(corpus)),
      "graft_cicr_img")
    MediaIndex.build(spark,
      Multimodal.audioDHash(Multimodal.audioTableOf(corpus)),
      "graft_cicr_aud")
    VideoIndex.build(spark,
      Multimodal.videoFramesFp(Multimodal.videoTableOf(corpus)),
      "graft_cicr_vid")
    VideoIndex.build(spark,
      Multimodal.imageRowsFp(Multimodal.imageTableOf(corpus)),
      "graft_cicr_imrw")
    // item 30's raster is rows 1..4 of tC's (payload bytes [48, 240));
    // item 31 shares nothing
    val batch = Seq((30L, tC.substring(48, 240)), (31L, varied(320, 11)))
      .toDF("doc_id", "text")
    def imageFlag(dial: Option[String]): Map[Long, Long] =
      CrawlAdmit.admitFlags(spark, batch, "graft_cicr_text",
        "graft_cicr_img", "graft_cicr_aud", "graft_cicr_vid",
        imageCropIdx = dial)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val off = imageFlag(None)
    assert(off(30L) == 1L,
      "the whole-image fingerprint must be blind to the crop")
    assert(off(31L) == 1L)
    val on = imageFlag(Some("graft_cicr_imrw"))
    assert(on(30L) == 0L,
      "the crop gate must refuse the vertical crop of stored material")
    assert(on(31L) == 1L,
      "the dial must not change the novel item's image admission")
  }

  test("imageCrop2dIdx dial: a sidebar-added edit (left half-rows kept, " +
      "right half replaced) slips the whole-image AND row gates and " +
      "refuses through the 2D block gate at one consistent shift") {
    val s = spark
    import s.implicits._
    def varied(n: Int, salt: Int): String =
      (0 until n).map(i =>
        (33 + (i * (37 + 2 * salt) + (i * i) % (19 + salt)) % 90).toChar)
        .mkString
    val tC = varied(320, 5)
    val corpus = Seq((1L, tC)).toDF("doc_id", "text")
    DedupIndex.build(spark, corpus, "text", "doc_id", "graft_c2d_text")
    MediaIndex.build(spark,
      Multimodal.imageDHash(Multimodal.imageTableOf(corpus)),
      "graft_c2d_img")
    MediaIndex.build(spark,
      Multimodal.audioDHash(Multimodal.audioTableOf(corpus)),
      "graft_c2d_aud")
    VideoIndex.build(spark,
      Multimodal.videoFramesFp(Multimodal.videoTableOf(corpus)),
      "graft_c2d_vid")
    VideoIndex.build(spark,
      Multimodal.imageRowsFp(Multimodal.imageTableOf(corpus)),
      "graft_c2d_imrw")
    VideoIndex.build(spark,
      Multimodal.imageBlocksFp(Multimodal.imageTableOf(corpus)),
      "graft_c2d_imbl")
    // item 40: each of tC's first 6 raster rows keeps its LEFT 8-px
    // half; the right half is new content — the sidebar/watermark-band
    // repost. Every 48-byte row differs (row grid blind), the whole
    // raster differs (dHash blind), but six left blocks match stored
    // blocks (gy, 0) at the consistent packed shift 0.
    val sidebar = (0 until 6).map(ri =>
      tC.substring(48 * ri, 48 * ri + 24) + varied(24, 60 + ri)).mkString
    val batch = Seq((40L, sidebar), (41L, varied(320, 17)))
      .toDF("doc_id", "text")
    def imageFlag(rows: Option[String], blocks: Option[String]): Map[Long, Long] =
      CrawlAdmit.admitFlags(spark, batch, "graft_c2d_text",
        "graft_c2d_img", "graft_c2d_aud", "graft_c2d_vid",
        imageCropIdx = rows, imageCrop2dIdx = blocks)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val off = imageFlag(None, None)
    assert(off(40L) == 1L && off(41L) == 1L,
      "the whole-image fingerprint must be blind to the sidebar edit")
    val rowsOnly = imageFlag(Some("graft_c2d_imrw"), None)
    assert(rowsOnly(40L) == 1L,
      "every 48-byte row changed — the ROW gate must also be blind")
    val on = imageFlag(Some("graft_c2d_imrw"), Some("graft_c2d_imbl"))
    assert(on(40L) == 0L,
      "the 2D block gate must refuse the sidebar edit of stored material")
    assert(on(41L) == 1L,
      "the dial must not change the novel item's image admission")
  }

  test("videoKeyframeIdx dial: a cross-codec re-wrap of stored " +
      "keyframes refuses through the decoded-digest gate; a novel " +
      "video admits") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog while seven " +
      "wise owls watch from the old stone bridge at dawn in cold rain "
    val tA = (base * 3).take(300) // ≥ 3 keyframes → sampled kfs 0 and 2
    val tB = ("numbers one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen " +
      "eighteen nineteen twenty twentyone twentytwo twentythree ") * 2
    val corpusA = Seq((1L, tA)).toDF("doc_id", "text")
    val corpusB = Seq((2L, tB.take(300))).toDF("doc_id", "text")
    // text/image/audio/plain-video indexes hold ONLY tB, so doc 10's
    // admission rides the keyframe leg alone
    DedupIndex.build(spark, corpusB, "text", "doc_id", "graft_cakf_text")
    MediaIndex.build(spark,
      Multimodal.imageDHash(Multimodal.imageTableOf(corpusB)),
      "graft_cakf_img")
    MediaIndex.build(spark,
      Multimodal.audioDHash(Multimodal.audioTableOf(corpusB)),
      "graft_cakf_aud")
    VideoIndex.build(spark,
      Multimodal.videoFramesFp(Multimodal.videoTableOf(corpusB)),
      "graft_cakf_vid")
    // the stored keyframe index holds tA's keyframes as BMP containers;
    // the batch rendition arrives as PNG (videoKeyframeTableOf's
    // default) — every container byte differs, the decoded rasters are
    // identical: the cross-codec re-wrap the decoded-digest gate exists
    // to refuse
    VideoIndex.build(spark,
      Multimodal.videoKeyframesFp(
        Multimodal.videoKeyframeTableOf(corpusA, "bmp")),
      "graft_cakf_kf", kfEvery = 2)
    // genuinely novel (no shared 32-byte frame, raster, or keyframe
    // with either corpus text)
    val tC = ("zebra quartz violet mango echo drift plasma copper " +
      "harbor salmon tundra willow ember falcon garnet hollow ") * 3
    val batch = Seq((10L, tA), (11L, tC.take(300))).toDF("doc_id", "text")
    def vids(kf: Option[String]): Map[Long, Long] =
      CrawlAdmit.admitFlags(spark, batch, "graft_cakf_text",
        "graft_cakf_img", "graft_cakf_aud", "graft_cakf_vid",
        videoKeyframeIdx = kf)
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val off = vids(None)
    assert(off(10L) == 1L && off(11L) == 1L,
      s"without the dial both items pass the plain video leg: $off")
    val on = vids(Some("graft_cakf_kf"))
    assert(on(10L) == 0L,
      "the decoded-digest gate must refuse the cross-codec re-wrap of " +
        s"stored keyframes: $on")
    assert(on(11L) == 1L,
      s"the dial must not change the novel video's admission: $on")
  }

  test("the all-dials bench entry runs the full gate composition over " +
      "the registered fixture batch") {
    val entry = Bench.benchOnly("b_crawl_admit_dials")
    entry.setup.foreach(_(spark, sf0001)) // untimed fixture builds (r16)
    val flags = entry.run(spark, sf0001)
      .localCheckpoint()
    val n = flags.count()
    assert(n > 0)
    // the verbatim re-fetch slice (+1M) must refuse under every dial
    // (dials only ADD refusals); the reversed novel slice (+2M)
    // OVERWHELMINGLY admits — perceptual gates at the family dist-6
    // dial have an honest small false-refusal rate on 48-byte text
    // rows (measured: 2/125 novel docs trip the image-crop leg at
    // sf0.001 — the recall re-probe exists so a deployment picks a
    // tighter dial; the designed crop/excerpt regimes match at
    // distance 0)
    import org.apache.spark.sql.functions.col
    assert(flags.where(col("doc_id") < 2000000L)
      .where(col("admit") =!= 0L).isEmpty)
    val novel = flags.where(col("doc_id") >= 2000000L).count()
    val admitted = flags.where(col("doc_id") >= 2000000L)
      .where(col("admit") === 1L).count()
    assert(admitted >= (novel * 9) / 10,
      s"novel slice must overwhelmingly admit: $admitted/$novel")
  }
}
