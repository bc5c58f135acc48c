package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed-count anomaly detection over an event log: the z-score of
  * each (key, time-bucket) event count against that key's own count
  * distribution across buckets — the volume-spike / outage readout of a
  * monitoring pipeline.
  *
  * Determinism: the moments are exact integer sums (counts, squared
  * counts); mean/variance/z are the only floating steps and mirror the
  * oracle's expression structure term for term, with the z displayed at
  * 4 dp and the flag computed from the unrounded z. Population variance
  * (÷ n_buckets); a key seen in a single bucket (or with constant
  * counts) has zero variance — z is null, never NaN, and not anomalous.
  *
  * Scale: two hash aggregations with map-side partials (the second over
  * one row per key) and one equi-join of counts against the tiny per-key
  * stats frame. Nothing global, nothing sorted. */
object Anomaly {

  def countAnomalies(events: DataFrame, keyCol: String, tsCol: String,
      bucket: String = "hour", threshold: Double = 3.0): DataFrame =
    zScores(events
      .groupBy(col(keyCol).as("key"), date_trunc(bucket, col(tsCol)).as("h"))
      .agg(count(lit(1)).as("n")), threshold)

  /** The scoring half over a prepared (key, h, n) counts frame — shared
    * with the streaming twin, whose counts come from a drained
    * complete-mode windowed aggregation (counts are exact either way,
    * so the twins agree bit for bit). */
  def zScores(counts: DataFrame, threshold: Double = 3.0): DataFrame = {
    val stats = counts.groupBy(col("key"))
      .agg(count(lit(1)).as("nb"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))
    val mean: Column = col("s").cast("double") / col("nb")
    val variance: Column = col("ss").cast("double") / col("nb") - mean * mean
    val z: Column = (col("n") - mean) / sqrt(variance)
    counts.join(stats, "key")
      .select(col("key"), col("h"), col("n"),
        when(variance > 0.0, round(z, 4)).as("z"),
        when(variance > 0.0 && abs(z) > threshold, lit(1L))
          .otherwise(lit(0L)).as("is_anomaly"))
  }
}
