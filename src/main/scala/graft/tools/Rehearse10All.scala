package graft.tools

import java.util.Locale

import org.apache.spark.sql.SparkSession

import graft.Registry

/** FULL-REGISTRY 10× scale bench (r11 VERDICT #7): every registered
  * query (plus the bench-only entries) timed at base sf0.1 AND on the
  * 10× synthesis in the same session, giving the two-point scale curve
  * the single-scale bench can't — a query whose ratio far exceeds its
  * data growth is hiding behind the micro-floor at sf0.1.
  *
  * Per query: min of 2 back-to-back runs per scale (the first run
  * absorbs codegen/listing warmup; the box's ±25 % cross-run swing
  * cancels out of the in-session base/10× ratio). A query that throws
  * records SKIP with the exception head — the q_embed_mutual_knn flat
  * guard is EXPECTED to trip at 10× (auto-k exceeds routeAbove; the
  * routed twin is the at-scale registration).
  * Usage: runMain graft.tools.Rehearse10All <sf0.1Dir> <outDir>
  */
object Rehearse10All {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Rehearse.synthesize(spark, sfDir, outDir)

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      var df: org.apache.spark.sql.DataFrame = null
      try {
        val t0 = System.nanoTime()
        df = fn(spark, dir)
        df.count()
        (System.nanoTime() - t0) / 1e9
      } finally {
        if (df != null)
          try graft.core.Checkpoints.release(df)
          catch { case _: Throwable => () }
      }
    }
    def minOf2(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = math.min(once(fn, dir), once(fn, dir))

    // SPARK_GRAFT_ONLY=a,b,c runs an addendum over a late registration
    // subset (the full-run rows are unaffected by registry order)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // benchOnly setups (fixture builds) run once per dir, untimed — the
    // r16 Bench hoists them out of the timed window, so the ratio here
    // measures the same operation the bench row measures.
    val setups: Map[String, (SparkSession, String) => Unit] =
      graft.Bench.benchOnly.collect {
        case (n, e) if e.setup.isDefined => n -> e.setup.get
      }
    val entries = (Registry.byName.map { case (n, q) => n -> q.run } ++
      graft.Bench.benchOnly.map { case (n, e) => n -> e.run }).toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    var totB = 0.0; var totX = 0.0; var nOk = 0
    val failed = Seq.newBuilder[String]
    entries.foreach { case (name, fn) =>
      try {
        setups.get(name).foreach(_(spark, sfDir))
        val base = minOf2(fn, sfDir)
        setups.get(name).foreach(_(spark, outDir))
        val big = minOf2(fn, outDir)
        totB += base; totX += big; nOk += 1
        println(f"R10X $name%-28s base=$base%7.2f s  x10=$big%7.2f s  " +
          f"ratio=${big / base}%5.1f")
      } catch {
        case e: Throwable =>
          failed += name
          println(s"R10X $name SKIP: " +
            e.getMessage.linesIterator.take(1).mkString.take(120))
      }
    }
    println(("R10X TOTAL ok=%d base=%.1f s  x10=%.1f s  ratio=%.2f  " +
      "skipped=%s").formatLocal(Locale.ROOT, nOk, totB, totX, totX / totB,
      failed.result().mkString(",")))
    spark.stop()
  }
}
