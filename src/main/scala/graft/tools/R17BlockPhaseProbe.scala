package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Dev probe (SCALE.md round-17 "block-grid recall for unaligned
  * crops" — r16 verdict "what's missing" #4): the 2D block grid tiles
  * 8-px-ALIGNED blocks, so a crop whose left edge is not 8-px-aligned
  * copies no aligned block and is structurally invisible. This probe
  * MEASURES it instead of arguing it: for each eligible document it
  * synthesizes one crop at a column phase `doc_id % 8` px (uniform
  * over phases 0–7, rows 1–4, 8 px wide — the imageCrop2dTable shape
  * at every phase) and runs the clip-gate join (fresh blocks vs corpus
  * blocks, consistent-shift grouping, ≥ 2 matched blocks) with BOTH
  * sides derived at each column hop ∈ {8, 4, 2, 1}. Reported per hop:
  * corpus block rows (the storage/join-row multiplier), crops
  * detected / total, and which phases were caught.
  *
  * Expected shape (and what the measurement is FOR): hop 8 catches
  * exactly the phase-0 eighth; hop h catches phases ≡ 0 (mod h); hop 1
  * catches all 8 at 8× corpus rows — the audio-overlap trade on the
  * column axis. The dial only pays if unaligned crops matter to the
  * deployment; the default stays aligned.
  *
  * Usage: runMain graft.tools.R17BlockPhaseProbe <sfDir>
  */
object R17BlockPhaseProbe {

  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rb = 48 // RowBytes at the 16-px corpus width
    val bb = 24 // BlockBytes
    // one crop per eligible doc at column phase (doc_id % 8) px:
    // rows 1–4 of the raster, 8 px wide, left edge at the phase —
    // byte [r*rb + 3*phase, +bb) per row — re-encoded at its honest
    // 8-px width (the imageCrop2dTable surgery at every phase)
    val docs = Tables.documents(spark, sfDir)
      .where(pmod(col("doc_id"), lit(4L)) === 1L)
      .where(length(encode(col("text"), "UTF-8")) >= 6 * rb)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content"))
    val crops = docs.as[Multimodal.MediaRow]
      .mapPartitions(_.map { r =>
        // uniform over phases 0–7 (media_id % 8 would collapse to
        // {1, 5} on the % 4 = 1 slice)
        val phase = ((r.media_id / 4) % 8).toInt
        val cropped = (1 to 4).flatMap { row =>
          r.content.slice(row * rb + 3 * phase, row * rb + 3 * phase + bb)
        }.toArray
        Multimodal.MediaRow(r.media_id + 6000000L,
          Multimodal.encodePngW(cropped, 8))
      }).toDF().localCheckpoint()
    val nCrops = crops.count()
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content")).as[Multimodal.MediaRow]
      .mapPartitions(_.map(r =>
        Multimodal.MediaRow(r.media_id, Multimodal.encodePng(r.content))))
      .toDF().localCheckpoint()

    println(s"[blockphase] sf=$sfDir eligible_crops=$nCrops")
    Seq(8, 4, 2, 1).foreach { hop =>
      val t0 = System.nanoTime()
      val cb = Multimodal.imageBlocksFp(corpus, colHopPx = hop)
        .localCheckpoint()
      val corpusRows = cb.count()
      val tBuild = (System.nanoTime() - t0) / 1e9
      val fb = Multimodal.imageBlocksFp(crops, colHopPx = hop)
        .localCheckpoint()
      val t1 = System.nanoTime()
      // the clip-gate join shape: fresh broadcast, digest equi-join,
      // consistent packed-shift grouping, >= 2 matched blocks
      val detected = cb
        .select(col("media_id").as("cid"), col("frame_idx").as("cf"),
          col("fm"))
        .join(broadcast(fb.select(col("media_id").as("fid"),
          col("frame_idx").as("ff"), col("fm"))), Seq("fm"))
        .where(col("cid") === col("fid") - 6000000L) // grade vs own source
        .groupBy(col("fid"), col("cid"),
          (col("cf") - col("ff")).as("shift"))
        .agg(count(lit(1)).as("mb"))
        .where(col("mb") >= 2)
        .select(col("fid")).distinct()
        .localCheckpoint()
      val nDet = detected.count()
      val tJoin = (System.nanoTime() - t1) / 1e9
      val phases = detected
        .select(expr("((fid - 6000000) div 4) % 8").as("ph"))
        .distinct().collect().map(_.getLong(0)).sorted.mkString(",")
      println(f"[blockphase] hop=$hop corpus_rows=$corpusRows " +
        f"recall=$nDet/$nCrops (${100.0 * nDet / math.max(1, nCrops)}%.1f%%) " +
        f"phases_caught=[$phases] build=${tBuild}%.1f s join=${tJoin}%.1f s")
      graft.core.Checkpoints.release(cb, fb, detected)
    }
    spark.stop()
  }
}
