package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: print one registered query's executed plan without running
  * it — `runMain graft.tools.PlanProbe <query> <sfDir>`. The standalone
  * form of PlanShapeSpec's `plan()`, for iterating on a single query's
  * join/exchange shape (e.g. attributing which join went SortMergeJoin)
  * faster than a spec cycle. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Registry.byName(args(0)).run(spark, args(1))
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
