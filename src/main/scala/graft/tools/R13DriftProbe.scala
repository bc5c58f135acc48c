package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.Similarity
import graft.sources.IvfIndex

/** r12 verdict #3: [[IvfIndex.append]] deliberately freezes cell
  * semantics to the stored quantizer (the standard IVF ingest contract),
  * but "rebuild when needed" had no trigger number. This probe measures
  * the trigger: append a deliberately DRIFTED distribution (dimensions
  * rotated by 7 + a +0.2 offset — pairwise structure intact, but the
  * appended mass lives where the stored centroids never trained) at
  * growing fractions of the corpus, and compare recall@5 for
  * drifted-regime queries served from the STALE quantizer vs a REBUILT
  * one, against exact brute-force truth over the grown corpus. The
  * resulting SCALE.md table is the rebuild policy: the appended
  * fraction at which stale recall leaves the rebuilt band is the
  * operational rebuild threshold.
  * Usage: runMain graft.tools.R13DriftProbe <sfDir> [numCentroids] [nProbe]
  */
object R13DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val numCentroids = if (args.length > 1) args(1).toInt else 64
    val nProbe = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)

    // deterministic drift: rotate dims by 7 and shift by +0.2 — the
    // appended vectors keep their mutual neighborhoods (truth stays
    // meaningful) but occupy a region the stored centroids never saw
    def drift(df: DataFrame): DataFrame = df.select(
      (col("vec_id") + lit(10000000L)).as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        (element_at(col("embedding"), ((i + lit(7)) % lit(dim)) + 1)
          + lit(0.2)).cast("float")).as("embedding"))

    // drifted-regime queries: 10 drifted vectors (the regime whose
    // recall an operator cares about after the distribution moves)
    def recallAt5(index: String, grown: DataFrame,
        queryIds: Seq[Long]): Double = {
      val queries = grown.where(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val served = IvfIndex.serve(spark, index, queries, k = 5,
          nProbe = nProbe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = Similarity.bruteForceKnn(grown, "vec_id", "embedding",
          col("vec_id").isin(queryIds: _*), k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & served).size.toDouble / truth.size
    }

    Seq(0.25, 0.5, 1.0).foreach { frac =>
      val fresh = drift(graft.llm.Sampling.hashSample(emb, "vec_id", frac))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nf = fresh.count()
      val grown = emb.unionByName(fresh)
      val queryIds = fresh.select(col("vec_id")).orderBy(col("vec_id"))
        .limit(10).collect().map(_.getLong(0)).toSeq

      val stale = s"graft_drift_s${(frac * 100).toInt}"
      IvfIndex.build(spark, emb, "vec_id", "embedding", stale,
        numCentroids)
      IvfIndex.append(spark, stale, fresh, "vec_id", "embedding")
      val rs = recallAt5(stale, grown, queryIds)

      val rebuilt = s"graft_drift_r${(frac * 100).toInt}"
      IvfIndex.build(spark, grown, "vec_id", "embedding", rebuilt,
        numCentroids)
      val rr = recallAt5(rebuilt, grown, queryIds)

      // the OTHER drift cost: appended mass crowding into few stale
      // cells balloons those posting lists — probe cost is the size of
      // the probed cells, so max/mean occupancy is the serve-cost skew
      def occ(index: String): (Long, Double) = {
        val o = spark.table(s"${index}_cells").groupBy(col("cell"))
          .agg(count(lit(1)).as("c"))
          .agg(max(col("c")), avg(col("c"))).head()
        (o.getLong(0), o.getDouble(1))
      }
      val (ms, as_) = occ(stale)
      val (mr, ar) = occ(rebuilt)
      println(f"PROBE np=$nProbe frac=$frac%.2f appended=$nf/$n " +
        f"recall_stale=$rs%.3f recall_rebuilt=$rr%.3f " +
        f"cellmax_stale=$ms (mean ${as_}%.1f) cellmax_rebuilt=$mr " +
        f"(mean $ar%.1f)")
      fresh.unpersist()
    }
    spark.stop()
  }
}
