package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.multimodal.Multimodal
import graft.sources.VideoIndex

/** Three-decade curve for the AUDIO EXCERPT family (the audio cell of
  * the shift-tolerant modality matrix, r15): a fixed two-regime excerpt
  * batch from the BASE corpus gates against segment indexes built over
  * base / ×100 / ×1000 corpora — what one crawl batch pays as the
  * stored corpus grows. Also measures segment-banding recall vs
  * brute-force Hamming truth on the gain regime (the R14MediaRecallProbe
  * discipline at segment level).
  *
  * Run: sbt "runMain graft.tools.R15AudioClipProbe [sfDir] [modes]"
  * (modes ⊆ exact,perc,recall — default all). */
object R15AudioClipProbe {
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
                else Set("exact", "perc", "recall")

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // the fixed crawl batch: both excerpt regimes of the BASE corpus
    val fresh = Multimodal.audioSegmentsFp(
      Multimodal.audioExcerptTable(spark, sfDir))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"fresh excerpt segments: ${fresh.count()}")

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
        val n = s"graft_r15aus_$label"
        if (!spark.catalog.tableExists(s"${n}_vf")) {
          val (ingest, _) = time(VideoIndex.build(spark,
            Multimodal.audioSegmentsFp(
              Multimodal.audioTable(spark, dir)), n))
          println(f"R15AUS ingest $label%-6s ${ingest}%8.2f s")
        }
        n
      }
      if (modes("exact")) {
        var rows = 0L
        val serves = (1 to 3).map { _ =>
          time(VideoIndex.clipAgainst(spark, name, fresh).count())
          match { case (t, n) => rows = n; t }
        }
        println(f"R15AUS exact $label%-6s serve=${serves.min}%6.2f s " +
          f"(min3, shift-rows=$rows)")
      }
      if (modes("perc")) {
        var rows = 0L
        val serves = (1 to 3).map { _ =>
          time(VideoIndex.clipPerceptualAgainst(spark, name, fresh)
            .count()) match { case (t, n) => rows = n; t }
        }
        println(f"R15AUS perc  $label%-6s serve=${serves.min}%6.2f s " +
          f"(min3, shift-rows=$rows)")
      }
    }

    // segment-banding recall at BASE scale (a property of the banding
    // math): brute-force position-free Hamming truth (the clip
    // relation's candidate universe) vs the 4×16 band rule, by distance
    if (modes("recall")) {
      val corpusSeg = Multimodal.audioSegmentsFp(
        Multimodal.audioTable(spark, sfDir))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val gainFresh = fresh.where(col("media_id") >= 3000000L)
      val truth = corpusSeg
        .select(col("media_id").as("cid"), col("frame_idx").as("cf"),
          col("f_lo").as("lb"), col("f_hi").as("hb"))
        .join(gainFresh.select(col("media_id").as("fid"),
          col("frame_idx").as("ff"), col("f_lo").as("la"),
          col("f_hi").as("ha")))
        .select(col("fid"), col("cid"), col("ff"), col("cf"),
          (expr("bit_count(la ^ lb)") + expr("bit_count(ha ^ hb)"))
            .cast("long").as("dist"))
        .where(col("dist") <= 8)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val banded = Multimodal.fpBands(gainFresh)
        .select(col("media_id").as("fid"), col("frame_idx").as("ff"),
          col("bi"), col("bv"))
        .join(Multimodal.fpBands(corpusSeg)
          .select(col("media_id").as("cid"), col("frame_idx").as("cf"),
            col("bi"), col("bv")), Seq("bi", "bv"))
        .select(col("fid"), col("cid"), col("ff"), col("cf")).distinct()
      println("=== segment-banding recall by exact Hamming distance ===")
      truth.groupBy("dist").count().withColumnRenamed("count", "truth")
        .join(truth.join(banded, Seq("fid", "cid", "ff", "cf"),
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
