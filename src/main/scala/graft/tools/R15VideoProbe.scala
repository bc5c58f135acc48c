package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.multimodal.Multimodal
import graft.sources.VideoIndex

/** Round-15 video rehearsals, three arms (pick with arg 2, default all):
  *
  *   - `clip`: the base/×100/×1000 curve for the SHIFT-TOLERANT crawl
  *     gate ([[VideoIndex.clipAgainst]]) — r14 left it with sf0.01
  *     correctness + a ×10 row while the aligned sibling had the full
  *     three decades; the quantity to pin is the shift histogram's
  *     growth with the corpus (a digest-only join groups by
  *     (pair, shift), so its exchange is match-bounded, not
  *     corpus-bounded — the curve should be stored-scan-shaped).
  *   - `perc`: the frame-banding recall row for the perceptual family
  *     (R14MediaRecallProbe's discipline at FRAME level): brute-force
  *     frame-aligned Hamming truth vs the 4×16 band candidate rule,
  *     bucketed by exact distance, over the gain + noise re-encode
  *     twins — the measured dial behind q_video_dedup_perceptual's
  *     maxDist=6; plus the perceptual gate's serve time per decade.
  *   - `buckets`: the [[graft.sources.Bucketing.autoBuckets]] effect at
  *     ×1000 — the same 33M-digest corpus served through pinned 16
  *     buckets vs the √-scaled count (the r14 verdict's "each bucket's
  *     file grows unboundedly" row).
  *
  * Usage: runMain graft.tools.R15VideoProbe <sf0.1Dir> [clip,perc,buckets]
  */
object R15VideoProbe {
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
                else Set("clip", "perc", "buckets")

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // fixed crawl batches from the BASE dir (what one batch pays as the
    // corpus grows)
    val freshClip = Multimodal.videoFrames(
      Multimodal.videoClipTwinTable(spark, sfDir, frameBytes = 32))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val freshPerc = Multimodal.videoFramesFp(
      Multimodal.videoPerceptualTwinTable(spark, sfDir, frameBytes = 32)
        .where(col("media_id") < 7000000L)) // gain + noise regimes
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"fresh clip frames: ${freshClip.count()}  " +
      s"fresh perc frames: ${freshPerc.count()}")

    val decades: Seq[(String, String)] = Seq(
      ("base", sfDir),
      ("x100", "/tmp/rehearse100"),
      ("x1000", "/tmp/rehearse1000_r14m"))
    decades.foreach { case (label, dir) =>
      if (dir != sfDir && !new java.io.File(s"$dir/_done").exists()) {
        label match {
          case "x100"  => Rehearse100.synthesize(spark, sfDir, dir)
          case "x1000" => Rehearse1000.synthesize(spark, sfDir, dir)
        }
      }
      lazy val name = {
        val n = s"graft_r15vid_$label"
        if (!spark.catalog.tableExists(s"${n}_vf")) {
          val (ingest, _) = time(VideoIndex.build(spark,
            Multimodal.videoFramesFp(Multimodal.videoTable(spark, dir)),
            n))
          println(f"R15VID ingest $label%-6s ${ingest}%8.2f s")
        }
        n
      }
      if (modes("clip")) {
        var rows = 0L
        val serves = (1 to 3).map { _ =>
          time(VideoIndex.clipAgainst(spark, name, freshClip).count())
          match { case (t, n) => rows = n; t }
        }
        println(f"R15VID clip  $label%-6s serve=${serves.min}%6.2f s " +
          f"(min3, shift-rows=$rows)")
      }
      if (modes("perc")) {
        var rows = 0L
        val serves = (1 to 3).map { _ =>
          time(VideoIndex.perceptualAgainst(spark, name, freshPerc)
            .count()) match { case (t, n) => rows = n; t }
        }
        println(f"R15VID perc  $label%-6s serve=${serves.min}%6.2f s " +
          f"(min3, pair-rows=$rows)")
      }
      if (modes("buckets") && label == "x1000") {
        val frames = Multimodal.videoFramesFp(
          Multimodal.videoTable(spark, dir))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val n = frames.count()
        val auto = graft.sources.Bucketing.autoBuckets(n)
        println(s"R15VID buckets x1000: $n rows, auto=$auto vs pinned=16")
        Seq(("pinned16", 16), (s"auto$auto", auto)).foreach {
          case (tag, k) =>
            val bn = s"graft_r15vid_bkt_$tag"
            val (ingest, _) =
              time(VideoIndex.build(spark, frames, bn, buckets = k))
            var rows = 0L
            val serves = (1 to 3).map { _ =>
              time(VideoIndex.pairsAgainst(spark, bn,
                freshClip).count()) match { case (t, c) => rows = c; t }
            }
            var crows = 0L
            val clips = (1 to 3).map { _ =>
              time(VideoIndex.clipAgainst(spark, bn,
                freshClip).count()) match { case (t, c) => crows = c; t }
            }
            println(f"R15VID buckets $tag%-9s ingest=${ingest}%8.2f s  " +
              f"aligned-serve=${serves.min}%6.2f s (rows=$rows)  " +
              f"clip-serve=${clips.min}%6.2f s (rows=$crows)")
        }
        frames.unpersist()
      }
    }

    // frame-banding recall at BASE scale (a property of the banding
    // math, not the corpus size): brute-force frame-aligned Hamming
    // truth vs the band candidate rule, by exact distance
    if (modes("perc")) {
      val corpusFp = Multimodal.videoFramesFp(
        Multimodal.videoTable(spark, sfDir))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val truth = corpusFp
        .select(col("media_id").as("cid"), col("frame_idx"),
          col("f_lo").as("lb"), col("f_hi").as("hb"))
        .join(freshPerc.select(col("media_id").as("fid"),
          col("frame_idx"), col("f_lo").as("la"), col("f_hi").as("ha")),
          Seq("frame_idx"))
        .select(col("fid"), col("cid"), col("frame_idx"),
          (expr("bit_count(la ^ lb)") + expr("bit_count(ha ^ hb)"))
            .cast("long").as("dist"))
        .where(col("dist") <= 8)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val banded = Multimodal.fpBands(freshPerc)
        .select(col("media_id").as("fid"), col("frame_idx"), col("bi"),
          col("bv"))
        .join(Multimodal.fpBands(corpusFp)
          .select(col("media_id").as("cid"), col("frame_idx"), col("bi"),
            col("bv")), Seq("frame_idx", "bi", "bv"))
        .select(col("fid"), col("cid"), col("frame_idx")).distinct()
      println(s"=== frame-banding recall by exact Hamming distance ===")
      truth.groupBy("dist").count().withColumnRenamed("count", "truth")
        .join(truth.join(banded, Seq("fid", "cid", "frame_idx"),
            "left_semi")
          .groupBy("dist").count().withColumnRenamed("count", "banded"),
          Seq("dist"), "left")
        .select(col("dist"), col("truth"),
          coalesce(col("banded"), lit(0L)).as("banded"),
          round(coalesce(col("banded"), lit(0L)) / col("truth"), 4)
            .as("recall"))
        .orderBy("dist").show(20)
    }
    spark.stop()
  }
}
