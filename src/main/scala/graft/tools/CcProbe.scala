package graft.tools
import org.apache.spark.sql.SparkSession
import graft.graph.{GraphOps, Iterative}

object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    Iterative.ccFind(spark.range(3).selectExpr("id as src", "id+1 as dst")).count()
    for (i <- 1 to 3)
      t(s"pagerank_$i") { Iterative.pagerank(GraphOps.sparseEdgesFromLineitem(spark, sfDir), tol = 0, maxIter = 20).count() }
    for (i <- 1 to 2)
      t(s"cc_stats_$i")  { Iterative.ccStats(Iterative.ccFind(GraphOps.sparseEdgesFromLineitem(spark, sfDir))).count() }
    spark.stop()
  }
}
