package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Round-10 adjudication probe for the q_bm25_topk regression: times the
  * query before/after the tf checkpoint fix and records the scoring-row
  * counts (tf rows, tf⋈query rows) so corpus drift is distinguishable
  * from plan drift in future rounds (VERDICT r9 "What's wrong" #1).
  * Usage: runMain graft.tools.R10Probe <sfDir> */
object R10Probe {
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
    docs.count() // warm footers

    // scoring-row census for drift attribution
    val tf = TextOps.words(docs, "text", "doc_id")
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val nTf = tf.count()
    val qterms = Seq("q1" -> "spark", "q1" -> "hash", "q1" -> "join",
      "q2" -> "table", "q2" -> "scan", "q2" -> "filter",
      "q3" -> "sort", "q3" -> "merge", "q3" -> "batch")
    import spark.implicits._
    val scoring = tf.join(qterms.toDF("qid", "word"), "word").count()
    val stats = docs.agg(count(lit(1)).as("n"), avg(length(col("text"))).as("avg_chars")).collect()(0)
    println(s"CENSUS docs=${stats.getLong(0)} avg_chars=${stats.getDouble(1)} tf_rows=$nTf scoring_rows=$scoring")

    def time(tag: String, n: Int)(f: => Long): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $tag min=${ts.min}%.3f samples=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("q_bm25_topk", 4) {
      val df = TextOps.bm25TopK(docs, "text", "doc_id",
        Seq("q1" -> "spark hash join", "q2" -> "table scan filter",
          "q3" -> "sort merge batch"), k = 5)
      val c = df.count(); graft.core.Checkpoints.release(df); c
    }
    time("q_tfidf", 4) {
      val df = TextOps.tfIdfTopK(docs, "text", "doc_id", 3)
      val c = df.count(); graft.core.Checkpoints.release(df); c
    }
    spark.stop()
  }
}
