package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{GraphOps, Iterative}

/** Dev probe: maximal-matching convergence depth on the sparse
  * lineitem graph — how many nomination rounds the oracle must unroll
  * per sf (matched-edge count stabilizes at the fixpoint).
  * Usage: runMain graft.tools.R10MatchProbe <sfDir>
  */
object R10MatchProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = GraphOps.sparseEdgesFromLineitem(spark, sfDir)
    var prev = -1L
    var r = 1
    while (r <= 20 && {
      val n = Iterative.maximalMatching(g, maxIter = r).count()
      println(s"PROBE rounds=$r matched=$n")
      val grown = n != prev
      prev = n
      grown
    }) r += 1
    println(s"PROBE stable at rounds=${r - 1}")
    spark.stop()
  }
}
