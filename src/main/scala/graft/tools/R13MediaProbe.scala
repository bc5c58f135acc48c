package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Dev probe (SCALE.md round 13 media-collapse addendum): decompose
  * q_image_dedup's ×100 cost into its decode/fingerprint stage vs the
  * collapsed pair stage, and count distinct payloads vs distinct
  * fingerprints — the numbers that decide whether a payload-digest
  * pre-collapse before decode (decode once per distinct payload) would
  * buy anything on this corpus, or whether the linear decode is
  * irreducible because the payloads are distinct.
  * Usage: runMain graft.tools.R13MediaProbe <mediaSfDir>
  */
object R13MediaProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val media = Multimodal.imageTable(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = media.count()
    val distinctPayloads = media.select(md5(col("content"))).distinct().count()
    val fp = Multimodal.imageDHash(media)
    val (fpCount, tDecode) = time(fp.count())
    val distinctFps = fp.select(col("h_lo"), col("h_hi")).distinct().count()
    val (pairs, tPairs) = time(
      Multimodal.imageDedupPairs(media, maxDist = 6).count())
    println(f"MEDIAPROBE rows=$n distinct_payloads=$distinctPayloads " +
      f"distinct_fps=$distinctFps fp_rows=$fpCount")
    println(f"MEDIAPROBE decode+fingerprint=$tDecode%.2f s  " +
      f"full_pairs=$tPairs%.2f s (pairs=$pairs) — pair stage ≈ " +
      f"${tPairs - tDecode}%.2f s over the collapsed path")
    media.unpersist()
    spark.stop()
  }
}
