package graft.tools
import org.apache.spark.sql.SparkSession
object R12TextRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val qs = Seq("q1" -> "spark hash join", "q2" -> "table scan filter",
      "q3" -> "sort merge batch")
    val name = graft.sources.TextIndex.ensureBuilt(spark, d)
    for (i <- 1 to 4) {
      val df = graft.sources.TextIndex.serve(spark, name, qs, k = 5)
      println(s"run $i rows=" + df.count())
      graft.core.Checkpoints.release(df)
    }
    println("DONE")
    spark.stop()
  }
}
