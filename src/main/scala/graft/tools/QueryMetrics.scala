package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** cummulative_stats parity (`/root/reference/src/mapreduce.cpp:3007-3071`):
  * the reference tracks cumulative comm/IO byte counters per op; Spark
  * exposes the same via task metrics. This listener aggregates shuffle
  * read/write bytes, records, and spill across an action — the per-query
  * instrumentation story for capacity planning at scale.
  */
final class QueryMetrics extends SparkListener {
  val shuffleReadBytes = new LongAdder
  val shuffleWriteBytes = new LongAdder
  val recordsRead = new LongAdder
  val spillBytes = new LongAdder

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
      recordsRead.add(m.inputMetrics.recordsRead)
      spillBytes.add(m.diskBytesSpilled)
    }
  }

  def snapshot: Map[String, Long] = Map(
    "shuffle_read_bytes" -> shuffleReadBytes.sum(),
    "shuffle_write_bytes" -> shuffleWriteBytes.sum(),
    "records_read" -> recordsRead.sum(),
    "spill_bytes" -> spillBytes.sum())
}

object QueryMetrics {
  /** Run `df.count()` under a fresh listener and return its metrics. */
  def measure(spark: SparkSession, df: DataFrame): (Long, Map[String, Long]) = {
    val listener = new QueryMetrics
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = df.count()
      // task-end events are posted asynchronously; allow the bus to drain
      Thread.sleep(500)
      (n, listener.snapshot)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
