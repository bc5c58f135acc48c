package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join.
  *
  * Spark has no native range-join operator: `a JOIN b ON a.t BETWEEN
  * b.lo AND b.hi` plans a BroadcastNestedLoopJoin (or a cartesian
  * product when neither side fits a broadcast) — points × intervals
  * comparisons, the classic 100 TB cliff. The standard rewrite is bin
  * bucketing: every interval is exploded to the bins it covers, every
  * point keys into its single bin, and the join becomes an EQUI-join on
  * bin followed by the exact bounds filter. Each (point, interval)
  * match is produced exactly once — a point owns exactly one bin, so
  * the interval's replica in that bin is the only one that can pair
  * with it; no dedup pass is needed.
  *
  * Cost model (the knob a deployment tunes): the interval side
  * replicates by avg(hi−lo)/binSize + 1 rows; the per-bin join fan-out
  * is points-per-bin × intervals-overlapping-the-bin. binSize near the
  * median interval length keeps replication ≤ 2× while bounding bin
  * occupancy; a heavily skewed bin (rush-hour points) is an AQE
  * skew-join / salting case like any hot equi-key. This is the same
  * bucketize-then-equi-join discipline as the MinHash bands and IVF
  * cells: turn a quadratic predicate into hash-partitionable work.
  *
  * Bounds are INCLUSIVE on both ends ([lo, hi]); callers needing
  * half-open semantics filter `t =!= hi` on the result. Columns `ptCol`,
  * `loCol`, `hiCol` must be integral (epoch seconds for time ranges —
  * cast before calling); `_bin` is reserved. */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val b = lit(binSize)
    val ivb = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / b).cast("long"),
        floor(col(hiCol) / b).cast("long"))))
    val ptb = points.withColumn("_bin",
      floor(col(ptCol) / b).cast("long"))
    ptb.join(ivb, Seq("_bin"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bin")
  }
}
