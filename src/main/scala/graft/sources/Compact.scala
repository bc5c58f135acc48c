package graft.sources

import org.apache.spark.sql.DataFrame

/** Output-file sizing: repartition a frame so the files it writes land
  * near a target size, using Catalyst's own size estimate.
  *
  * The small-files problem is the write-side analog of the reference's
  * `gather` (`src/mapreduce.cpp:893-1043` — concentrate KVs onto fewer
  * procs before output): a 100 TB pipeline that writes a file per
  * shuffle task produces millions of KB-sized files and a metadata-bound
  * downstream scan. Shrinking uses `coalesce` (no shuffle — folds
  * existing partitions in place); growing uses a round-robin
  * `repartition` (one shuffle, only when asked to split). */
object Compact {

  /** Partition count targeting ~targetBytes per output file. */
  def plannedPartitions(df: DataFrame, targetBytes: Long = 128L << 20): Int = {
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (size + targetBytes - 1) / targetBytes
    n.min(BigInt(Int.MaxValue)).max(BigInt(1)).toInt
  }

  /** Repartition for writing: coalesce down (shuffle-free), split up only
    * when `allowGrow` (costs a shuffle). */
  def forWrite(df: DataFrame, targetBytes: Long = 128L << 20,
      allowGrow: Boolean = false): DataFrame = {
    val want = plannedPartitions(df, targetBytes)
    val have = df.rdd.getNumPartitions
    if (want < have) df.coalesce(want)
    else if (want > have && allowGrow) df.repartition(want)
    else df
  }
}
