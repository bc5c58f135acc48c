package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.Dedup

/** Dev tool: stage-level timing of the MinHash LSH pipeline. */
object StageTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("shingleArray count") {
      docs.select(size(Dedup.shingleArray(col("text"), 3)).as("n"))
        .agg(sum("n")).head()
    }
    time("signatures") {
      Dedup.minHashSignatures(docs, "text", "doc_id").count()
    }
    time("full lsh pairs") {
      Dedup.minHashLshPairs(docs, "text", "doc_id").count()
    }
    time("full lsh pairs again") {
      Dedup.minHashLshPairs(docs, "text", "doc_id").count()
    }
    spark.stop()
  }
}
