package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 dev probe: where do q_containment_pairs' 100× seconds go —
  * the shingle checkpoint, the df+candidate stage, or verification?
  * And does keying the SAME plan on md5 digests (16 bytes) instead of
  * shingle strings move it? */
object R8ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // current shape
    val sh = t("shingles+checkpoint") {
      val s = graft.llm.Dedup.shingles(docs, "text", "doc_id").localCheckpoint()
      s.count(); s
    }
    val cand = t("candidates(strings)") {
      val c = graft.llm.Dedup.containmentCandidates(sh, 50L, 5L).localCheckpoint()
      c.count(); c
    }
    t("full query") {
      graft.llm.Dedup.containmentPairs(docs, "text", "doc_id",
        k = 3, tau = 0.5, maxDf = 50L, minShared = 5L).count()
    }
    // digest-keyed variant of the candidate stage
    val shd = t("digest shingles+checkpoint") {
      val s = graft.llm.Dedup.shingles(docs, "text", "doc_id")
        .select(col("id"), md5(col("shingle")).as("shingle")).localCheckpoint()
      s.count(); s
    }
    t("candidates(digests)") {
      graft.llm.Dedup.containmentCandidates(shd, 50L, 5L).count()
    }
    spark.stop()
  }
}
