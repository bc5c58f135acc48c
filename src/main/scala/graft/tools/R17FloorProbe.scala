package graft.tools

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Registry

/** WARM-FLOOR pinning for the expensive bench tail (r16 verdict "next
  * round" #2): min-of-10 WARM runs per query on a quiet window, so
  * future captures' weather can be subtracted mechanically (capture ÷
  * floor = the window's cohort factor) instead of re-attributed by
  * fresh probes every round. The floors land in SCALE.md's round-17
  * floor table; a capture row is only evidence of a CODE regression
  * when its time moves against the floor by more than the window's
  * cohort factor (measured on the untouched rows of the same capture).
  *
  * Protocol per query: fixtures warmed untimed ([[graft.Bench]]'s
  * warmup), one untimed warm run (codegen + listing), then 10 timed
  * runs; report min + median. Box load is printed alongside — floors
  * recorded at load ≳ 0.5/cpu are weather-contaminated and should be
  * re-probed.
  *
  * Usage: runMain graft.tools.R17FloorProbe <sfDir> [q1,q2,...]
  * (default: the BENCH_r16 top-20 by recorded time + the bench-only
  * maintenance windows among them)
  */
object R17FloorProbe {

  /** The r16 driver capture's top rows — the tail where single cold
    * samples carried up to 28× error. */
  val DefaultQueries: Seq[String] = Seq(
    "q_image_crop_perceptual", "q_image_crop_detect_stored",
    "q_image_crop_detect", "q_embed_pq_refined_tuned",
    "q_event_transitions", "q_events_hourly", "q_image_dedup_against",
    "q_event_anomaly", "q_except", "q_incremental_dedup", "q_pagerank",
    "q_curation_pipeline", "q_cc_labels_star", "q_crawl_admit",
    "q_image_crop2d_perceptual", "q_containment_pairs", "q_cc_stats",
    "q_anf_diameter", "q_luby_mis", "q_cluster_split", "q_dedup_clusters",
    "q_image_crop2d_detect", "q_hybrid_rrf_stored", "q_sssp",
    "q_image_dedup_stored")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def load(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage

    println(f"[floor] sf=$sfDir cpus=$cpus load_at_start=${load()}%.2f")
    graft.Bench.warmFixtures(spark, sfDir)

    def once(fn: (SparkSession, String) => DataFrame): Double = {
      var df: DataFrame = null
      try {
        val t0 = System.nanoTime()
        df = fn(spark, sfDir)
        df.count()
        (System.nanoTime() - t0) / 1e9
      } finally {
        if (df != null)
          try graft.core.Checkpoints.release(df)
          catch { case _: Throwable => () }
      }
    }

    def f(v: Double): String = "%.2f".formatLocal(Locale.ROOT, v)
    names.foreach { name =>
      Registry.byName.get(name) match {
        case None => println(s"[floor] $name SKIP (not registered)")
        case Some(q) =>
          try {
            once(q.run) // untimed warm
            val ts = (1 to 10).map(_ => once(q.run)).sorted
            // even-sized sample: median is the mean of the two middle
            // order statistics (r17 ADVICE: ts(4) alone is the lower
            // middle and biases recorded floors low)
            val med = (ts(4) + ts(5)) / 2
            println(s"[floor] $name min=${f(ts.head)} " +
              s"med=${f(med)} max=${f(ts.last)} " +
              "load=" + f(load()))
          } catch {
            case e: Throwable =>
              println(s"[floor] $name FAILED ${e.getClass.getSimpleName}")
          }
      }
    }
    spark.stop()
  }
}
