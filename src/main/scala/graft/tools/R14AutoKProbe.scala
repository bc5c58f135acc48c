package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.IvfIndex
import graft.llm.Similarity

/** ×1000 measurement for the AUTO-SCALED IVF cell dial (r13 verdict
  * stretch #8): the r13 ×1000 note admitted the pinned 64-cell stored
  * index legitimately scans the probed QUARTER of a 2M-vector corpus at
  * nProbe=16 — serve was 1.94 s while the BM25 stored floor sat at
  * ~1 s. autoCells(2M) = 15625 cells (occupancy ~128) probes ~0.1 % of
  * the corpus at the same nProbe, so the serve row should drop toward
  * the floor — IF recall holds at the registered dial, which this probe
  * measures against the brute-force truth rather than assumes
  * (R13DriftProbe's lesson: partition changes move tight-probe recall
  * in either direction).
  *
  * Rows printed (SCALE.md "auto-k ×1000"):
  *   - build time at k=64 (flat) vs k=auto (routed through the √k grid)
  *   - serve time (median of 3) at both dials, same queries/k/nProbe
  *   - recall@5 of both dials vs exact brute force over the ×1000 corpus
  * Usage: runMain graft.tools.R14AutoKProbe <sf0.1Dir> <outDir> */
object R14AutoKProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(outDir != sfDir, "never synthesize over the source tables")
    Rehearse1000.synthesize(spark, sfDir, outDir)

    val emb = graft.Tables.embeddings(spark, outDir)
    val n = emb.count()
    val kAuto = IvfIndex.autoCells(n)
    println(s"AUTOK corpus n=$n autoCells=$kAuto (occupancy ~${n / kAuto})")

    def timed[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"AUTOK $what%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val name64 = timed("build k=64 (flat)") {
      IvfIndex.ensureBuilt(spark, outDir, numCentroids = 64)
    }
    val nameAuto = timed(s"build k=$kAuto (routed)") {
      IvfIndex.ensureBuiltAuto(spark, outDir)._1
    }
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .localCheckpoint()

    def serveMed(name: String, label: String): Set[(Long, Long)] = {
      var out: Set[(Long, Long)] = null
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = IvfIndex.serve(spark, name, queries, k = 5, nProbe = 16)
        out = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val med = (1 to 3).map(_ => once()).sorted.apply(1)
      println(f"AUTOK serve $label%-22s ${med}%.2f s (median of 3)")
      out
    }
    val got64 = serveMed(name64, "k=64 nProbe=16")

    // exact truth over the full x1000 corpus (10 queries x n cosines)
    val truth = timed("brute-force truth") {
      Similarity.bruteForceKnn(emb, "vec_id", "embedding",
          col("vec_id") < 10, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def recall(got: Set[(Long, Long)]): Double =
      got.count(truth.contains).toDouble / truth.size
    println(f"AUTOK recall@5 k=64 nProbe=16   ${recall(got64)}%.3f")
    // the R13DriftProbe discipline: a partition change moves
    // tight-probe recall, so re-probe BEFORE narrowing — sweep nProbe
    // at the auto dial and report the recall/cost frontier
    Seq(16, 32, 64).foreach { np =>
      var out: Set[(Long, Long)] = null
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = IvfIndex.serve(spark, nameAuto, queries, k = 5,
          nProbe = np)
        out = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val med = (1 to 3).map(_ => once()).sorted.apply(1)
      println(f"AUTOK k=$kAuto nProbe=$np%-3d ${med}%.2f s  " +
        f"recall@5 ${recall(out)}%.3f")
    }
    spark.stop()
  }
}
