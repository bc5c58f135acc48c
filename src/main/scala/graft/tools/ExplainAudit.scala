package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Dev tool: dump formatted physical plans for plan-shape review
  * (pushdown / pruning / broadcast / whole-stage codegen).
  * Usage: runMain graft.tools.ExplainAudit <sfDir> <outFile> [names...] */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else Registry.all.map(_.name)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    names.foreach { n =>
      Registry.byName.get(n).foreach { q =>
        sb.append(s"\n===== $n =====\n")
        try sb.append(q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    spark.stop()
  }
}
