package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Registry

/** r11 VERDICT #5 probe: q_semantic_incremental moved 0.563 → 0.833 s
  * (1.48×) between rounds — the only >1.3× drift among 76 common benched
  * queries — with visibly noisy samples. This probe attributes the delta
  * with numbers: N back-to-back samples of the registered query plus a
  * split timing of its two halves (corpus kmeans + centroid refresh vs
  * the fresh-routing + within-cell pair join), so SCALE.md can record
  * either "harness noise, min reproduces the old number" or "real, and
  * here is the stage that grew".
  * Usage: runMain graft.tools.R12IncProbe <sfDir> [n]
  */
object R12IncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String, body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val t = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label%-28s ${t}%.3f s"); t
    }

    // warm: file listing + codegen
    Registry.byName("q_semantic_incremental").run(spark, sfDir).count()

    val full = (1 to n).map { i =>
      var df: org.apache.spark.sql.DataFrame = null
      val t = time(s"q_semantic_incremental#$i", {
        df = Registry.byName("q_semantic_incremental").run(spark, sfDir)
        df.count()
      })
      graft.core.Checkpoints.release(df)
      t
    }
    println(f"PROBE samples min=${full.min}%.3f med=" +
      f"${full.sorted.apply(n / 2)}%.3f max=${full.max}%.3f")

    // stage split: the kmeans + third-refresh half alone
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val fresh = graft.llm.Sampling.hashSample(emb, "vec_id", 0.2)
    val corpus = emb.join(fresh.select(col("vec_id")), Seq("vec_id"),
      "left_anti")
    (1 to 3).foreach { i =>
      var a: org.apache.spark.sql.DataFrame = null
      time(s"kmeans-half#$i", {
        a = graft.llm.Similarity.kmeans(corpus, "vec_id", "embedding",
          dim = 64, k = 16, iters = 2)
        a.count()
      })
      graft.core.Checkpoints.release(a)
    }
    spark.stop()
  }
}
