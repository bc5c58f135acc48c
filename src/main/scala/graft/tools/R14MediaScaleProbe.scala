package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.multimodal.Multimodal
import graft.sources.MediaIndex

/** base/×100/×1000 curve for the media crawl-admission shape
  * ([[MediaIndex.pairsAgainst]]) — the fourth family's version of the
  * r13 serve-flatness rows. The pair-LIST queries explode
  * combinatorially with the corpus (the ×100 stored row already emits
  * 24M pairs), so past ×100 the realistic serve is incremental: a
  * crawl batch of FIXED size (the base sf dir's 0.9×-amplitude slice,
  * 1250 fingerprints) gates against an ever-larger stored corpus.
  * Per decade this measures:
  *   - ingest: encode + dHash + bucketed build of the corpus
  *     fingerprints (paid once per corpus, the stored-index thesis);
  *   - serve: pairsAgainst of the fixed fresh batch vs the STORED
  *     table, min-of-3 (what every crawl batch pays);
  *   - recompute: the same banding with the corpus fingerprints
  *     re-derived live (encode + dHash per query — what a user without
  *     the index pays), once.
  * Usage: runMain graft.tools.R14MediaScaleProbe <sf0.1Dir>
  * (reuses /tmp/rehearse100 if _done; synthesizes ×1000 into
  * /tmp/rehearse1000_r14m via Rehearse1000's document synthesis).
  */
object R14MediaScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val modes = if (args.length > 1) args(1).split(",").toSet
                else Set("audio", "image")

    // the crawl batches: FIXED at a base-sized slice across every decade
    val freshAudio = Multimodal.audioDHash(
      Multimodal.audioScaledTable(spark, sfDir))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // image re-crawl: the same slice's payloads VERBATIM under shifted
    // ids (PNG has no amplitude dial; a verbatim re-fetch is the crawl
    // regime anyway — dist-0 matches)
    val freshImage = Multimodal.imageDHash(Multimodal.imageTableOf(
      graft.Tables.documents(spark, sfDir)
        .where(pmod(col("doc_id"), lit(4L)) === 1L)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // video re-crawl: the same slice verbatim under shifted ids — the
    // fifth family's frame-level gate (5–10 frame rows per item)
    val freshVideo = Multimodal.videoFrames(Multimodal.videoTableOf(
      graft.Tables.documents(spark, sfDir)
        .where(pmod(col("doc_id"), lit(4L)) === 1L)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"fresh audio fp: ${freshAudio.count()}  " +
      s"fresh image fp: ${freshImage.count()}  " +
      s"fresh video frames: ${freshVideo.count()}")

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // base/×100/×1000, all disjoint-vocab (the ×10 tool replicates docs
    // VERBATIM — a different dup regime that would bend the curve)
    val decades: Seq[(String, String)] = Seq(
      ("base", sfDir),
      ("x100", "/tmp/rehearse100"), // reuse the r13 synthesis if present
      ("x1000", "/tmp/rehearse1000_r14m"))
    decades.foreach { case (label, dir) =>
      if (dir != sfDir && !new java.io.File(s"$dir/_done").exists()) {
        label match {
          case "x100"  => Rehearse100.synthesize(spark, sfDir, dir)
          case "x1000" => Rehearse1000.synthesize(spark, sfDir, dir)
        }
      }
      def arm(mode: String, fresh: org.apache.spark.sql.DataFrame,
          corpusFp: => org.apache.spark.sql.DataFrame): Unit = {
        val name = s"graft_media_r14scale_${mode}_$label"
        val (ingest, _) = time(MediaIndex.build(spark, corpusFp, name))
        var rows = 0L
        val serves = (1 to 3).map { _ =>
          time(MediaIndex.pairsAgainst(spark, name, fresh).count()) match {
            case (t, n) => rows = n; t
          }
        }
        val (recompute, rrows) =
          time(MediaIndex.pairsAgainstFp(corpusFp, fresh).count())
        println(f"R14MEDIA $mode%-5s $label%-6s ingest=${ingest}%8.2f s  " +
          f"serve=${serves.min}%6.2f s (min3, rows=$rows)  " +
          f"recompute=${recompute}%8.2f s (rows=$rrows)")
      }
      if (modes("audio")) arm("audio", freshAudio,
        Multimodal.audioDHash(Multimodal.audioTable(spark, dir)))
      if (modes("image")) arm("image", freshImage,
        Multimodal.imageDHash(Multimodal.imageTable(spark, dir)))
      if (modes("video")) {
        def corpusFrames = Multimodal.videoFrames(
          Multimodal.videoTable(spark, dir))
        val name = s"graft_media_r14scale_video_$label"
        val (ingest, _) =
          time(graft.sources.VideoIndex.build(spark, corpusFrames, name))
        var rows = 0L
        val serves = (1 to 3).map { _ =>
          time(graft.sources.VideoIndex
            .pairsAgainst(spark, name, freshVideo).count()) match {
            case (t, n) => rows = n; t
          }
        }
        val (recompute, rrows) = time(graft.sources.VideoIndex
          .pairsAgainstFrames(corpusFrames, freshVideo).count())
        println(f"R14MEDIA video $label%-6s ingest=${ingest}%8.2f s  " +
          f"serve=${serves.min}%6.2f s (min3, rows=$rows)  " +
          f"recompute=${recompute}%8.2f s (rows=$rrows)")
      }
    }
    spark.stop()
  }
}
