package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.MediaIndex

/** Measured recall of the 4×16-bit dHash banding (the media family's
  * candidate rule) against brute-force Hamming truth — the RecallProbe
  * discipline applied to fingerprints. Pigeonhole guarantees a shared
  * band only at dist ≤ 3; dist 4–6 pairs CAN spread one flipped bit
  * into every band and go unbanded, so the scaladoc's recall contract
  * ("the banded family's") deserves a number. Brute force is the
  * fresh × corpus crossJoin (batch-sized × corpus — 6.25M Hamming
  * comparisons at sf0.1, trivial), banded is [[MediaIndex
  * .pairsAgainst]]; both bucketed by exact distance.
  * Usage: runMain graft.tools.R14MediaRecallProbe <sfDir> [maxDist]
  */
object R14MediaRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxDist = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpusFp = Multimodal.audioDHash(
      Multimodal.audioTable(spark, sfDir)).localCheckpoint()
    val freshFp = Multimodal.audioDHash(
      Multimodal.audioScaledTable(spark, sfDir)).localCheckpoint()
    MediaIndex.build(spark, corpusFp, "graft_media_recall_probe")

    val truth = freshFp
      .select(col("media_id").as("fid"), col("h_lo").as("la"),
        col("h_hi").as("ha"))
      .crossJoin(broadcast(corpusFp.select(col("media_id").as("cid"),
        col("h_lo").as("lb"), col("h_hi").as("hb"))))
      .select(col("fid"), col("cid"),
        (expr("bit_count(la ^ lb)") + expr("bit_count(ha ^ hb)"))
          .cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      .localCheckpoint()
    val banded = MediaIndex.pairsAgainst(spark,
      "graft_media_recall_probe", freshFp, maxDist).localCheckpoint()

    val t = truth.groupBy("dist").count()
      .withColumnRenamed("count", "truth")
    val b = banded.groupBy("dist").count()
      .withColumnRenamed("count", "banded")
    println(s"=== banded recall by exact Hamming distance ($sfDir) ===")
    t.join(b, Seq("dist"), "left")
      .select(col("dist"), col("truth"),
        coalesce(col("banded"), lit(0L)).as("banded"),
        round(coalesce(col("banded"), lit(0L)) / col("truth"), 4)
          .as("recall"))
      .orderBy("dist")
      .show(20)
    val missed = truth.join(banded, Seq("fid", "cid"), "left_anti")
    println(s"missed pairs total (dist <= $maxDist): ${missed.count()}")
    missed.groupBy("dist").count().orderBy("dist").show(20)
    spark.stop()
  }
}
