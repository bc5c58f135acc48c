package graft.tools
import org.apache.spark.sql.SparkSession
import graft.Registry

/** Dev probe: warm sf0.1 medians for individual registered queries. */
object R5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args(0).split(",").foreach { name =>
      val q = Registry.byName(name)
      q.run(spark, sfDir).count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); q.run(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"R5PROBE $name%-24s median=${ts.sorted.apply(1)}%.2f s")
    }
    spark.stop()
  }
}
