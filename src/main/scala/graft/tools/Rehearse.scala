package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Registry, Tables}

/** 10× scale rehearsal (dev tooling, SCALE.md "10× scale rehearsal"):
  * synthesizes a 10×-sf0.1 corpus by key-shifted replication into
  * `outDir` (documents replicated verbatim — dup-heavy BY CONSTRUCTION;
  * events get shifted users so key cardinality scales; lineitem gets
  * coprime key offsets so the derived mod-N graphs genuinely densify),
  * then times the named queries there, printing one line per query for
  * the SCALE.md table. Usage:
  *   runMain graft.tools.Rehearse <sf0.1Dir> <outDir> <query,query,...>
  */
object Rehearse {

  private def replicate(spark: SparkSession, df: DataFrame,
      shift: DataFrame => Int => DataFrame): DataFrame =
    (0 until 10).map(r => shift(df)(r)).reduce(_ unionByName _)

  def synthesize(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    // dims are copied verbatim; guarded PER TABLE (not by _done) so a
    // dir synthesized before a table joined the list self-heals —
    // r12: q_union skipped at 10× because supplier/part were never
    // copied (only the q_pivot/q_stream_enrich dims were). The guard
    // checks the _SUCCESS marker INSIDE the directory, not the bare
    // directory: a crash mid-write leaves a partial <t>.parquet dir
    // that would otherwise satisfy exists() forever (r12 ADVICE).
    Seq("customer", "orders", "nation", "region", "supplier", "part")
      .foreach { t =>
        if (!new java.io.File(s"$outDir/$t.parquet/_SUCCESS").exists())
          try Tables.load(spark, sfDir, t)
            .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              System.err.println(
                s"[rehearse] dim $t skipped (missing): ${e.getMessage}")
          }
      }
    val done = new java.io.File(s"$outDir/_done")
    if (done.exists()) return
    val docs = Tables.documents(spark, sfDir)
    replicate(spark, docs, d => r =>
      d.withColumn("doc_id", col("doc_id") + lit(r * 10000000L)))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val ev = Tables.events(spark, sfDir)
    // user shift exceeds the sf0.1 max user_id (1499), so each replica
    // brings NEW users — key cardinality genuinely scales 10× (a smaller
    // shift would overlap replicas and merely densify existing keys)
    replicate(spark, ev, d => r =>
      d.withColumn("event_id", col("event_id") + lit(r * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(r * 10000L)))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    val emb = Tables.embeddings(spark, sfDir)
    replicate(spark, emb, d => r =>
      d.withColumn("vec_id", col("vec_id") + lit(r * 1000000L)))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val li = Tables.lineitem(spark, sfDir)
    replicate(spark, li, d => r =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * 31L))
        .withColumn("l_partkey", col("l_partkey") + lit(r * 37L)))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    done.createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, queryCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // outDir == sfDir means "time at the base scale only" (never
    // synthesize into — let alone over — the source tables)
    if (outDir != sfDir) synthesize(spark, sfDir, outDir)
    def time(q: graft.Q, dir: String): Double = {
      // release each run's terminal checkpoints (the round-5 leak
      // discipline): N queries × 4 runs × 2 scales would otherwise
      // accumulate dead blocks and tax whatever runs late
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = q.run(spark, dir)
        df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Checkpoints.release(df)
        dt
      }
      once() // warm (codegen + listing)
      (1 to 3).map(_ => once()).sorted.apply(1) // median of 3
    }
    queryCsv.split(",").foreach { name =>
      val q = Registry.byName(name)
      if (outDir == sfDir) {
        println(f"REHEARSE $name%-24s base=${time(q, sfDir)}%.2f s")
      } else {
        // base and 10× in the SAME session, back to back — the ±25 %
        // cross-run box swing cancels out of the ratio
        val base = time(q, sfDir)
        val big = time(q, outDir)
        println(f"REHEARSE $name%-24s base=$base%.2f s  x10=$big%.2f s  ratio=${big / base}%.1f")
      }
    }
    spark.stop()
  }
}
