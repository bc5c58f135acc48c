package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Registry, Tables}

/** 100× scale rehearsal for the dedup + ANN headline family (dev
  * tooling, SCALE.md "100× scale rehearsal").
  *
  * Differs deliberately from [[Rehearse]]'s 10× synthesis: replicating
  * documents VERBATIM multiplies the near-dup group sizes, so pair
  * outputs grow quadratically in the factor (100× verbatim ⇒ ~5000×
  * the pairs) — that measures output explosion, not algorithm scaling.
  * Here every replica r ≥ 1 suffixes each word with `_r`, making
  * cross-replica shingle/gram sets DISJOINT: the corpus grows 100×
  * while the duplicate RATE stays the base corpus's (each replica
  * carries the same internal dup structure), which is the "more crawl
  * data, same dup fraction" scaling a production pipeline actually
  * sees. Replica 0 is verbatim, so the base corpus embeds unchanged.
  * Embeddings replicate with shifted ids (the ANN query side stays the
  * 10 original vectors; cells and codebooks retrain on the 100×
  * corpus).
  *
  * Usage: runMain graft.tools.Rehearse100 <sf0.1Dir> <outDir> <q,q,...>
  */
object Rehearse100 {

  val Factor = 100

  def synthesize(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    // r10 addition, guarded separately so pre-r10 rehearsal dirs (whose
    // _done predates lineitem) self-heal: coprime key offsets per replica
    // (the Rehearse 10× trick) so the mod-10000 derived graphs get ~100×
    // DISTINCT edges — verbatim replication would collapse to the base
    // graph under the edge distinct.
    if (!new java.io.File(s"$outDir/lineitem.parquet").exists()) {
      val li = Tables.lineitem(spark, sfDir)
      (0 until Factor).map { r =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(r * 31L))
          .withColumn("l_partkey", col("l_partkey") + lit(r * 37L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    }
    // r10 second tranche, self-healing guard like lineitem: 100× the
    // USER population (shifted ids), per-user history unchanged — the
    // "more users, same behavior" scaling funnel/retention see in
    // production. Event ids shift too so they stay unique.
    if (!new java.io.File(s"$outDir/events.parquet").exists()) {
      val ev = Tables.events(spark, sfDir)
      (0 until Factor).map { r =>
        ev.withColumn("user_id", col("user_id") + lit(r * 1000000L))
          .withColumn("event_id", col("event_id") + lit(r * 100000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }
    val done = new java.io.File(s"$outDir/_done")
    if (done.exists()) return
    val docs = Tables.documents(spark, sfDir)
    (0 until Factor).map { r =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
      if (r == 0) d
      else d.withColumn("text",
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("_" + r))), " "))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = Tables.embeddings(spark, sfDir)
    (0 until Factor).map { r =>
      emb.withColumn("vec_id", col("vec_id") + lit(r * 1000000L))
    }.reduce(_ unionByName _)
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(outDir != sfDir, "never synthesize over the source tables")
    synthesize(spark, sfDir, outDir)
    def time(q: graft.Q, dir: String): (Double, Long) = {
      var rows = 0L
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = q.run(spark, dir)
        rows = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Checkpoints.release(df)
        dt
      }
      once() // warm
      ((1 to 3).map(_ => once()).sorted.apply(1), rows)
    }
    queryCsv.split(",").foreach { name =>
      val q = Registry.byName(name)
      val (base, baseRows) = time(q, sfDir)
      val (big, bigRows) = time(q, outDir)
      println(f"REHEARSE100 $name%-24s base=$base%.2f s ($baseRows%d rows)  " +
        f"x100=$big%.2f s ($bigRows%d rows)  ratio=${big / base}%.1f  " +
        f"rowratio=${bigRows.toDouble / math.max(1, baseRows)}%.1f")
    }
    spark.stop()
  }
}
