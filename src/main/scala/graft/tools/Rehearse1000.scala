package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Registry, Tables}

/** 1000× serve-flatness rehearsal (r12 verdict #8): the stored indexes'
  * whole thesis is serve-cost ∝ query, not corpus — this takes the
  * documents/embeddings synthesis one decade past [[Rehearse100]]
  * (5M docs / 2M vectors from sf0.1) so SCALE.md can show three-point
  * curves: serve flat while the recompute twins climb.
  *
  * Same disjoint-vocab design as Rehearse100 (replica r ≥ 1 suffixes
  * every word with `_r`: corpus grows 1000×, dup RATE stays the base
  * corpus's, and the BM25 query terms match replica 0 only — the
  * selectivity a real query has against a real crawl). Synthesized via
  * ONE crossJoin against a 1000-row replica frame — a 1000-branch union
  * would plan 1000 scans. Only documents + embeddings are written: the
  * three stored families and their recompute twins touch nothing else.
  * Usage: runMain graft.tools.Rehearse1000 <sf0.1Dir> <outDir> <q,q,...>
  */
object Rehearse1000 {

  val Factor = 1000

  def synthesize(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val done = new java.io.File(s"$outDir/_done")
    if (done.exists()) return
    val reps = spark.range(Factor).select(col("id").as("r"))
    val docs = Tables.documents(spark, sfDir)
    val suffixed = array_join(transform(split(col("text"), " "),
      w => concat(w, lit("_"), col("r"))), " ")
    docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("r") * 10000000L).as("doc_id"),
        when(col("r") === 0, col("text")).otherwise(suffixed).as("text"),
        col("lang"), col("source"),
        when(col("r") === 0, col("n_chars"))
          .otherwise(length(suffixed)).as("n_chars"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = Tables.embeddings(spark, sfDir)
    emb.crossJoin(reps)
      .select((col("vec_id") + col("r") * 1000000L).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    done.createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, queryCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(outDir != sfDir, "never synthesize over the source tables")
    synthesize(spark, sfDir, outDir)
    queryCsv.split(",").foreach { name =>
      val q = Registry.byName(name)
      var rows = 0L
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = q.run(spark, outDir)
        rows = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Checkpoints.release(df)
        dt
      }
      val w = once() // warm (includes any one-time index build)
      val t = math.min(once(), once())
      println(f"R1000 $name%-28s ${t}%.2f s (warm ${w}%.2f, rows=$rows)")
    }
    spark.stop()
  }
}
