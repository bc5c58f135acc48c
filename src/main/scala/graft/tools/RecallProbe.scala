package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Registry

/** Dev probe (SCALE.md "ANN recall, measured"): recall@5 of every
  * approximate-ANN registered query against the brute-force
  * q_embed_knn ground truth — all variants share the same probe set
  * (vec_id < 10) and k = 5, so the (qid, nid) pair sets compare
  * directly. Turns the family's recall CONTRACTS (nProbe, multi-probe
  * flips, shortlist width) into measured numbers per corpus.
  * Usage: runMain graft.tools.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pairs(name: String): Set[(Long, Long)] = {
      val df = Registry.byName(name).run(spark, sfDir)
      val out = df.select(col("qid").cast("long"), col("nid").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.core.Checkpoints.release(df)
      out
    }
    val truth = pairs("q_embed_knn")
    Seq("q_embed_ivf_knn", "q_embed_lsh_knn", "q_embed_pq_knn",
      "q_embed_pq_refined", "q_embed_ivfpq_knn", "q_embed_ivfpq_res_knn")
      .foreach { name =>
        val got = pairs(name)
        val hit = (got & truth).size
        println(f"RECALL $name%-24s recall@5=${hit.toDouble / truth.size}%.3f " +
          f"($hit/${truth.size}, returned=${got.size})")
      }
    spark.stop()
  }
}
