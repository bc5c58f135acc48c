package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Generic drift-attribution prober (the R12IncProbe discipline made
  * reusable — r12 verdict #6): N back-to-back samples of any registered
  * query on one warmed session, printing per-sample times and
  * min/median/max, so a single-sample bench move can be attributed as
  * "harness noise — min reproduces the recorded number" or "real — the
  * floor itself moved" with numbers instead of guesses.
  * Usage: runMain graft.tools.QueryProbe <sfDir> <query>[,query...] [n]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val n = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      // warm once: file listing + codegen, excluded from samples
      Registry.byName(name).run(spark, sfDir).count()
      val ts = (1 to n).map { i =>
        var df: org.apache.spark.sql.DataFrame = null
        val t0 = System.nanoTime()
        df = Registry.byName(name).run(spark, sfDir)
        df.count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name#$i%-3d ${t}%.3f s")
        graft.core.Checkpoints.release(df)
        t
      }
      println(f"PROBE $name min=${ts.min}%.3f " +
        f"med=${ts.sorted.apply(n / 2)}%.3f max=${ts.max}%.3f")
    }
    spark.stop()
  }
}
