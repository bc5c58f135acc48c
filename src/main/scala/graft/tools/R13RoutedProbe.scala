package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.IvfIndex

/** Dev probe (SCALE.md round 13 "routed index INGEST"): wall time of
  * the persisted-index BUILD, flat vs routed assignment, as the cell
  * count grows — the claim under test is that flat ingest is N·k while
  * routed is ~N·2√k, so the gap must WIDEN with k (≈ k/2√k = √k/2:
  * ~4× at k=64, ~8× at 256, ~16× at 1024 in candidate counts). The
  * corpus is the sf embeddings replicated `factor`× via one crossJoin
  * against a range frame (ids remapped into disjoint decades), so N is
  * big enough that per-build constants don't drown the term being
  * measured.
  * Usage: runMain graft.tools.R13RoutedProbe <sfDir> [factor]
  */
object R13RoutedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val emb = base.crossJoin(
        spark.range(factor).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * lit(100000000L)).as("vec_id"),
        col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    println(s"ROUTEDPROBE corpus: $n vectors (factor $factor)")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    Seq(64, 256, 1024).foreach { k =>
      val tFlat = time(IvfIndex.build(spark, emb, "vec_id", "embedding",
        s"graft_rp_flat_$k", numCentroids = k, routeAbove = Int.MaxValue))
      val tRouted = time(IvfIndex.build(spark, emb, "vec_id", "embedding",
        s"graft_rp_routed_$k", numCentroids = k, routeAbove = 0))
      println(f"ROUTEDPROBE k=$k%-5d flat=$tFlat%7.2f s  " +
        f"routed=$tRouted%7.2f s  speedup=${tFlat / tRouted}%4.1f")
    }
    spark.stop()
  }
}
