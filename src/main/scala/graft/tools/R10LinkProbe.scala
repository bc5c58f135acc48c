package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.GraphOps

/** Dev probe: Adamic–Adar at scale with and without the hub cap — the
  * wedge join is inherently Σ deg² rows, and on the saturated ×100
  * harness graph (fixed mod-10000 id space → avg degree ~240) the
  * uncapped join OOMs; the maxDegree dial restores feasibility.
  * Usage: runMain graft.tools.R10LinkProbe <dir> <maxDegree|none>
  */
object R10LinkProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, capStr) = args
    val cap = if (capStr == "none") None else Some(capStr.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = GraphOps.linkPrediction(
      GraphOps.sparseEdgesFromLineitem(spark, dir), topK = 100,
      maxDegree = cap).count()
    println(f"LINKPROBE dir=$dir cap=$capStr rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
