package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention analysis over an event log: bucket each key into the
  * epoch-week (or any `bucketSec`) of its FIRST event, then for every
  * later bucket count how many of that cohort were active again.
  *
  * Buckets are integer `floor(epoch_seconds / bucketSec)` — engine-
  * agnostic arithmetic, no calendar week-start or timezone semantics to
  * disagree on with the oracle.
  *
  * Scale: three hash-partitioned passes, each with map-side partials —
  * (1) per-key min-ts (the cohort frame, one row per key), (2) distinct
  * (key, bucket) activity, (3) the key-keyed equi-join of the two and a
  * (cohort, offset) count-distinct. The closing retention-percentage
  * window partitions by cohort over a frame whose size is
  * #cohorts × #offsets — trivially small at any corpus scale. Nothing
  * global, nothing quadratic; the offset-0 row doubles as the cohort
  * size (a key is by definition active in its own first bucket).
  */
object Retention {

  /** Returns (cohort, week_offset, active_users, retention_pct): cohort
    * is the first-activity bucket index, `active_users` counts distinct
    * keys of that cohort active `week_offset` buckets later, and
    * `retention_pct` divides by the cohort's offset-0 size (4 dp). */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String,
      bucketSec: Long = 604800L): DataFrame = {
    require(bucketSec > 0, "bucket must be positive")
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(c.cast("double") / bucketSec).cast("long")
    fromActivity(events
      .select(col(keyCol).as("k"), bucket(col(tsCol)).as("wk"))
      .distinct())
  }

  /** The scoring half over a distinct (k, wk) activity frame — each
    * key's cohort is its MIN bucket (= the bucket of its min timestamp;
    * bucketing is monotone). Shared with the streaming twin, whose
    * activity pairs come from a drained `dropDuplicates` stream —
    * distinct sets are exact in both worlds, so the twins agree. */
  def fromActivity(active: DataFrame): DataFrame = {
    val first = active.groupBy(col("k")).agg(min(col("wk")).as("cohort"))
    val counts = first.join(active, "k")
      .groupBy(col("cohort"), (col("wk") - col("cohort")).as("week_offset"))
      .agg(count_distinct(col("k")).as("active_users"))
    val size0 = Window.partitionBy(col("cohort"))
    counts.select(col("cohort"), col("week_offset"), col("active_users"),
      round(col("active_users") * 1.0 /
        max(when(col("week_offset") === 0L, col("active_users"))).over(size0),
        4).as("retention_pct"))
  }
}
