package graft.tools

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Min-of-N probe for BENCH-ONLY windows (R17FloorProbe covers only
  * registered queries): warms fixtures + the window's own setup once,
  * then times the run body N times — the same timed region
  * [[graft.Bench]] samples.
  *
  * Usage: runMain graft.tools.R19WindowProbe <sfDir> [n] [w1,w2,...]
  */
object R19WindowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 7
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else Seq("b_crawl_admit_dials")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def load(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    def f(v: Double): String = "%.2f".formatLocal(Locale.ROOT, v)

    graft.Bench.warmFixtures(spark, sfDir)
    names.foreach { name =>
      graft.Bench.benchOnly.get(name) match {
        case None => println(s"[wprobe] $name SKIP (not a bench window)")
        case Some(e) =>
          e.setup.foreach(_(spark, sfDir))
          def once(): Double = {
            var df: DataFrame = null
            try {
              val t0 = System.nanoTime()
              df = e.run(spark, sfDir)
              df.count()
              (System.nanoTime() - t0) / 1e9
            } finally {
              if (df != null)
                try graft.core.Checkpoints.release(df)
                catch { case _: Throwable => () }
            }
          }
          once() // warm codegen
          val ts = (1 to n).map(_ => once()).sorted
          println(s"[wprobe] $name min=${f(ts.head)} med=${f(ts(n / 2))} " +
            s"max=${f(ts.last)} load=${f(load())}")
      }
    }
    spark.stop()
  }
}
