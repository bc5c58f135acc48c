package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.VideoIndex

/** The persisted frame-digest index must answer exactly what the live
  * frame derivation answers — the stored layout changes COST, never
  * answers — and the lifecycle must mirror the sibling families. */
class VideoIndexSpec extends AnyFunSuite {
  import TestSession._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def fullMedia = Multimodal.videoTable(spark, sf0001)
    .unionByName(Multimodal.videoTwinTable(spark, sf0001, frameBytes = 32))

  test("stored pairs equal the live derivation over corpus + twins") {
    VideoIndex.build(spark, Multimodal.videoFrames(fullMedia),
      "graft_video_spec_all")
    val stored = rows(VideoIndex.pairs(spark, "graft_video_spec_all"))
    val live = rows(Multimodal.videoDedupPairs(fullMedia))
    assert(stored == live && stored.nonEmpty)
  }

  test("append folds a crawl batch in: pairs equal a full rebuild") {
    val media = fullMedia
    val batch = media.where(col("media_id") >= 1000000L)
    val corpus = media.where(col("media_id") < 1000000L)
    VideoIndex.build(spark, Multimodal.videoFrames(corpus),
      "graft_video_spec_app")
    val before = rows(VideoIndex.pairs(spark, "graft_video_spec_app"))
    VideoIndex.append(spark, "graft_video_spec_app",
      Multimodal.videoFrames(batch))
    val after = rows(VideoIndex.pairs(spark, "graft_video_spec_app"))
    val full = rows(Multimodal.videoDedupPairs(media))
    assert(after == full && (after -- before).nonEmpty)
  }

  test("remove erases a video's pair surface; a re-crawl re-pairs") {
    val media = fullMedia
    VideoIndex.build(spark, Multimodal.videoFrames(media),
      "graft_video_spec_rm")
    val all = rows(VideoIndex.pairs(spark, "graft_video_spec_rm"))
    val victim = all.head.head.asInstanceOf[Long]
    val s = spark
    import s.implicits._
    VideoIndex.remove(spark, "graft_video_spec_rm",
      Seq(victim).toDF("media_id"))
    val post = rows(VideoIndex.pairs(spark, "graft_video_spec_rm"))
    assert(!post.exists(r => r.head == victim || r(1) == victim))
    assert(post == all.filterNot(r => r.head == victim || r(1) == victim),
      "removal must not disturb any pair not involving the victim")
    VideoIndex.append(spark, "graft_video_spec_rm",
      Multimodal.videoFrames(media.where(col("media_id") === victim)))
    assert(rows(VideoIndex.pairs(spark, "graft_video_spec_rm")) == all)
  }

  test("pairsAgainst is cross-only; dedupAgainst admits exactly the unmatched remainder") {
    val corpus = Multimodal.videoTable(spark, sf0001)
    val fresh = Multimodal.videoTwinTable(spark, sf0001, frameBytes = 32)
    VideoIndex.build(spark, Multimodal.videoFrames(corpus),
      "graft_video_spec_agn")
    val freshFrames = Multimodal.videoFrames(fresh).localCheckpoint()
    val got = VideoIndex.pairsAgainst(spark, "graft_video_spec_agn",
      freshFrames).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)), r.getLong(2))).toSet
    val truth = rows(Multimodal.videoDedupPairs(
        corpus.unionByName(fresh)))
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long]))
      .filter(p => (p._1 >= 1000000L) != (p._2 >= 1000000L))
    assert(got == truth && got.nonEmpty,
      s"cross restriction of the live pairs, exactly: got=${got.size} " +
        s"truth=${truth.size}")
    val matchedFresh = got.flatMap(p => Seq(p._1, p._2))
      .filter(_ >= 1000000L)
    val admitted = VideoIndex.dedupAgainst(spark, "graft_video_spec_agn",
      freshFrames).select(col("media_id"))
      .collect().map(_.getLong(0)).toSet
    val freshIds = freshFrames.select(col("media_id"))
      .collect().map(_.getLong(0)).toSet
    // the re-cut slice never aligns with the corpus, so it admits
    assert(admitted == freshIds -- matchedFresh && admitted.nonEmpty)
    assert(admitted.exists(id => id >= 2000000L && id < 3000000L),
      "re-cut copies must be admitted (alignment refused them)")
  }

  test("a re-cut slips the aligned gate but not the shift-tolerant clip gate") {
    val corpus = Multimodal.videoTable(spark, sf0001)
    VideoIndex.build(spark, Multimodal.videoFrames(corpus),
      "graft_video_spec_clip")
    val recuts = Multimodal.videoFrames(
      Multimodal.videoClipTwinTable(spark, sf0001, frameBytes = 32))
      .localCheckpoint()
    // aligned gate: one-stride rotations never align — all admitted
    val aligned = VideoIndex.pairsAgainst(spark, "graft_video_spec_clip",
      recuts)
    assert(aligned.count() == 0L,
      "the aligned gate admits re-cuts by design")
    // clip gate: every re-cut caught against its original at shift 2
    val clips = VideoIndex.clipAgainst(spark, "graft_video_spec_clip",
      recuts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val own = clips.filter(p => p._1 == p._2 + 4000000L)
    assert(own.nonEmpty && own.forall(p => p._3 == 2L && p._4 >= 2L),
      s"every re-cut must surface at shift 2: ${clips.take(5).toSeq}")
    // a re-cut overlaps its original on sampled frame f iff original
    // frame f+2 is full and pre-wrap: 96 + 32f <= n. Two sampled
    // overlaps (f = 0, 2) therefore need n >= 160; shorter docs
    // genuinely share < minFrames frames with their original — the
    // contract, not a miss.
    val caught = clips.map(_._1).toSet
    val longEnough = graft.Tables.documents(spark, sf0001)
      .where(pmod(col("doc_id"), lit(4L)) === 1L)
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).as("n"))
      .collect().filter(_.getInt(1) >= 160)
      .map(_.getLong(0) + 4000000L).toSet
    assert(longEnough.nonEmpty && longEnough.subsetOf(caught),
      s"every >=160-byte re-cut must be caught: missing " +
        s"${(longEnough -- caught).take(5)}")
    val freshIds = recuts.select(col("media_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert((freshIds -- caught).forall(id => !longEnough.contains(id)),
      "only sub-160-byte re-cuts may pass the clip gate")
  }

  test("pairsAgainst plan: fresh batch broadcasts; stored frames never shuffle before the join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val corpus = Multimodal.videoTable(spark, sf0001)
    VideoIndex.build(spark, Multimodal.videoFrames(corpus),
      "graft_video_spec_plan")
    val freshFrames = Multimodal.videoFrames(
      Multimodal.videoTwinTable(spark, sf0001, frameBytes = 32))
      .localCheckpoint()
    val df = VideoIndex.pairsAgainst(spark, "graft_video_spec_plan",
      freshFrames)
    df.count()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"the aligned frame match must be a broadcast equi-join:\n$plan")
    val shuffledStored = plan.collect {
      case e: ShuffleExchangeExec
          if e.child.toString.contains("graft_video_spec_plan_vf") => e
    }
    assert(shuffledStored.isEmpty,
      s"the stored frame digests must stream map-side:\n$plan")
  }

  test("maintain compacts only when fragmented") {
    val corpus = Multimodal.videoTable(spark, sf0001)
    VideoIndex.build(spark, Multimodal.videoFrames(corpus),
      "graft_video_spec_mnt")
    // a fresh build is 1 file/bucket: maintain is a no-op
    val first = VideoIndex.maintain(spark, "graft_video_spec_mnt")
    assert(first.values.forall { case (b, a) => b == a })
    // fragment with appends, then maintain folds back to 1 file/bucket
    (1 to 5).foreach { i =>
      VideoIndex.append(spark, "graft_video_spec_mnt",
        Multimodal.videoFrames(
          Multimodal.videoTwinTable(spark, sf0001, frameBytes = 32))
          .withColumn("media_id", col("media_id") + lit(i * 10000000L)))
    }
    val before = rows(VideoIndex.pairs(spark, "graft_video_spec_mnt"))
    val second = VideoIndex.maintain(spark, "graft_video_spec_mnt")
    assert(second.values.exists { case (b, a) => a < b },
      s"fragmented table must compact: $second")
    assert(rows(VideoIndex.pairs(spark, "graft_video_spec_mnt")) == before)
  }
}
