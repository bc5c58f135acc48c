package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.llm.Retrieval

/** Dev probe (SCALE.md "hybrid retrieval crossover"): exact-scan vs
  * IVF-backed hybrid RRF as the PROBE VOLUME grows — the dimension the
  * registered 3-probe fixture can't show. The exact semantic arm costs
  * |Q|·|corpus| cosines per batch; the IVF arm pays a |corpus|·cells
  * assignment ONCE per run (in production a stored ingest-time layout —
  * q_stream_embed_route) plus |Q|·fan-in scoring, so the curves cross
  * where probe volume amortizes the assignment.
  * Usage: runMain graft.tools.R11RetrievalProbe <sfDir> [nProbes,...]
  */
object R11RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sizes = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                else Seq(3, 50, 200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    docs.count(); emb.count() // warm
    val words = Seq("spark hash join", "table scan filter", "sort merge batch")
    def run(n: Int, sem: Retrieval.SemanticRetriever): Double = {
      val qs = (0 until n).map(i => (s"q$i", words(i % 3), i.toLong))
      def once(): Double = {
        val t0 = System.nanoTime()
        Retrieval.hybridRrf(docs, emb, "text", "doc_id", "vec_id",
          "embedding", qs, kEach = 20, kOut = 10, semantic = sem).count()
        (System.nanoTime() - t0) / 1e9
      }
      once(); (1 to 3).map(_ => once()).sorted.apply(1)
    }
    sizes.foreach { n =>
      val ex = run(n, Retrieval.ExactScan)
      val ivf = run(n, Retrieval.IvfRetriever(numCentroids = 64, nProbe = 16))
      println(f"RETRIEVAL probes=$n%4d exact=$ex%.2f s  ivf=$ivf%.2f s  " +
        f"ratio(ivf/exact)=${ivf / ex}%.2f")
    }
    spark.stop()
  }
}
