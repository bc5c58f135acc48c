package graft.tools
import org.apache.spark.sql.SparkSession
import graft.graph.{GraphOps, Iterative}

/** Dev probe: isolated warm timings for the iterative family (the
  * bench-noise attribution tool — see SCALE.md round-5 notes). */
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
    for (i <- 1 to 2) {
      t(s"cc_labels_$i") { Iterative.ccFind(GraphOps.sparseEdgesFromLineitem(spark, sfDir)).count() }
      t(s"cc_star_$i")   { Iterative.ccFindStar(GraphOps.sparseEdgesFromLineitem(spark, sfDir)).count() }
      t(s"sssp_multi_$i"){
        import org.apache.spark.sql.functions.col
        val e = GraphOps.sparseEdgesFromLineitem(spark, sfDir).where("src <> dst")
        val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        Iterative.ssspMulti(GraphOps.withWeights(sym), Iterative.goodSources(sym, 3)).count()
      }
      t(s"luby_$i")      { Iterative.lubyMis(GraphOps.sparseEdgesFromLineitem(spark, sfDir)).count() }
    }
    spark.stop()
  }
}
