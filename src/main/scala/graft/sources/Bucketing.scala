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

  /** Equi-join two tables bucketed on `key` with equal bucket counts —
    * planner proves co-location from the catalog, no Exchange appears. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
