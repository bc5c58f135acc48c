package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{GraphOps, Triangles}

/** Dev probe: k-truss convergence depth on the mid-density lineitem
  * graph — how many peel rounds the oracle must unroll per sf.
  * Usage: runMain graft.tools.R10TrussProbe <sfDir> <k>
  */
object R10TrussProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, kStr) = args
    val k = kStr.toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var u = GraphOps.edgeUpper(GraphOps.midEdgesFromLineitem(spark, sfDir))
      .localCheckpoint()
    var m = u.count()
    println(s"PROBE round=0 edges=$m")
    var changed = m > 0
    var iter = 0
    while (changed && iter < 40) {
      val keep = Triangles.kTruss(u, k, maxIter = 1)
        .select(col("src"), col("dst")) // one peel round exactly
      val m2 = keep.count()
      changed = m2 != m
      u = keep.localCheckpoint()
      m = m2
      iter += 1
      println(s"PROBE round=$iter edges=$m")
    }
    println(s"PROBE converged after $iter rounds (k=$k)")
    spark.stop()
  }
}
