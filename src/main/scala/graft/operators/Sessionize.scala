package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: the window-function twin of the
  * streaming `session_window` aggregation (streaming/Streams.scala) for
  * backfills and replays over at-rest event logs. A new session starts
  * where the gap to the previous event of the same key exceeds
  * `gapSec`; session ids are a running sum of those breaks.
  *
  * Scale: both window functions share one (key)-partitioned,
  * (ts, eventId)-sorted spec — one shuffle + one sort total, parallel in
  * the number of keys; the closing aggregate groups on a superset of the
  * window key. No global ordering anywhere.
  */
object Sessionize {

  /** Returns one row per session: (key, session_id, n_events, t_start,
    * t_end). `tieCol` breaks equal-timestamp ordering deterministically
    * (an id column). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSec: Long = 1800L): DataFrame = {
    require(gapSec > 0, "gap must be positive")
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val brk = when(lag(col(tsCol), 1).over(order).isNull ||
        col(tsCol).cast("double") -
          lag(col(tsCol), 1).over(order).cast("double") > gapSec,
      lit(1L)).otherwise(lit(0L))
    events
      .withColumn("__brk", brk)
      .withColumn("session_id",
        sum(col("__brk")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"))
  }
}
