package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.Registry

/** Round-19 deliverable tool: writes `.explain("formatted")` for the
  * named registered queries to `plans/r19/<name>_<suffix>.txt` — the
  * judge checks the round's plan claims (Exchange counts, join
  * strategies, PushedFilters/ReadSchema) against these files.
  *
  * Usage: runMain graft.tools.R19PlanDump <sfDir> <suffix> q1,q2,...
  *
  * Plans are captured lazily (no execution) EXCEPT where a query's
  * builder runs fixture work (ensureBuilt* stored indexes) — that
  * executes once here exactly as it does in the bench warmup, so the
  * dumped plan is the serve plan the timed run pays, not the build. */
object R19PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans/r19")
    Files.createDirectories(outDir)
    names.foreach { name =>
      Registry.byName.get(name) match {
        case None => System.err.println(s"[plan] $name SKIP (not registered)")
        case Some(q) =>
          try {
            val df = q.run(spark, sfDir)
            val txt = df.queryExecution.explainString(FormattedMode)
            Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
            try graft.core.Checkpoints.release(df)
            catch { case _: Throwable => () }
            System.err.println(s"[plan] $name -> ${name}_$suffix.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plan] $name FAILED ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
