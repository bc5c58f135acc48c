package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.text.{Bpe, BpeQueries}

/** Dev probe (r10 VERDICT #6): attribute q_bpe_encode's cost between
  * the training phase (Rounds driver-looped merge selections over the
  * word-TYPE table — 2 Spark jobs per round) and the encode phase (the
  * per-distinct-word merge fold + broadcast joins into the doc scan).
  * Usage: runMain graft.tools.R11BpeProbe <sfDir>
  */
object R11BpeProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm the scan
    (1 to 3).foreach { pass =>
      val t0 = System.nanoTime()
      val (merges, types) =
        Bpe.train(docs.where("doc_id % 2 = 0"), "text", BpeQueries.Rounds)
      val t1 = System.nanoTime()
      val sv = Bpe.symbolVocab(types).as[(String, Long)].collect().toSeq
      types.unpersist()
      val t2 = System.nanoTime()
      val n = Bpe.encodeSummary(docs, "text", "doc_id", merges,
        sv.toDF("sym", "id")).count()
      val t3 = System.nanoTime()
      println(f"BPEPROBE pass=$pass train=${(t1 - t0) / 1e9}%.2f s  " +
        f"vocab=${(t2 - t1) / 1e9}%.2f s  encode=${(t3 - t2) / 1e9}%.2f s  " +
        f"(rows=$n, rounds=${BpeQueries.Rounds}, merges=${merges.size})")
    }
    spark.stop()
  }
}
