package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Registry

/** Round-19 streaming-overhead decomposition (guide §1.2: measure where
  * the time actually is before touching the operators). For each
  * q_stream_* entry: wall per run (warm, min/med of N) plus the
  * per-batch `durationMs` map from the StreamingQueryProgress records of
  * the last drain — separating micro-batch machinery (walCommit,
  * latestOffset, queryPlanning, commitOffsets) from operator work
  * (addBatch).
  *
  * Usage: runMain graft.tools.R19StreamProbe <sfDir> [n] [q1,q2,...]
  */
object R19StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names =
      if (args.length > 2 && args(2).nonEmpty)
        args(2).split(",").map(_.trim).toSeq
      else Registry.byName.keys.filter(_.startsWith("q_stream")).toSeq.sorted
    if (args.length > 3)
      spark.conf.set("graft.stream.shufflePartitions", args(3))

    def once(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.count()
      val t = (System.nanoTime() - t0) / 1e9
      try graft.core.Checkpoints.release(df) catch { case _: Throwable => () }
      t
    }

    names.foreach { name =>
      Registry.byName.get(name) match {
        case None => println(s"[sprobe] $name SKIP")
        case Some(q) =>
          once(q.run) // warm: codegen + staging + listings
          val ts = (1 to n).map(_ => once(q.run)).sorted
          val prog = graft.streaming.Streams.lastDrainProgress
          val batchLines = prog.map { p =>
            val dm = p.durationMs
            val keys = dm.keySet.toArray(Array.empty[String]).sorted
            keys.map(k => s"$k=${dm.get(k)}").mkString(
              s"b${p.batchId}{numInput=${p.numInputRows} ", " ", "}")
          }.mkString(" | ")
          println(f"[sprobe] $name%-28s min=${ts.head}%.3f med=${ts(n / 2)}%.3f  $batchLines")
      }
    }
    spark.stop()
  }
}
