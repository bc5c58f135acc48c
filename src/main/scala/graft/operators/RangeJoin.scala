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

  /** Interval-overlap join: all (a, b) pairs whose closed intervals
    * intersect ([loA,hiA] ∩ [loB,hiB] ≠ ∅ ⇔ loA ≤ hiB AND loB ≤ hiA).
    * Same bin rewrite as [[pointInInterval]] with BOTH sides exploded;
    * an overlapping pair shares every bin their intersection covers, so
    * duplicate emission is suppressed WITHOUT a distinct pass by keeping
    * a pair only in the FIRST bin it shares — `bin ==
    * max(floor(loA/binSize), floor(loB/binSize))`, a per-row predicate
    * (the later of the two starts lands in the first shared bin of any
    * intersecting pair). Replication and skew economics are
    * pointInInterval's, paid on both sides. Caller column sets must be
    * disjoint; `_bin` is reserved on either side. */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      loA: String, hiA: String, loB: String, hiB: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val bs = lit(binSize)
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("_bin", explode(sequence(
        floor(col(lo) / bs).cast("long"), floor(col(hi) / bs).cast("long"))))
    binned(a, loA, hiA).join(binned(b, loB, hiB), Seq("_bin"))
      .where(col(loA) <= col(hiB) && col(loB) <= col(hiA) &&
        col("_bin") === greatest(floor(col(loA) / bs).cast("long"),
          floor(col(loB) / bs).cast("long")))
      .drop("_bin")
  }
}
