package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * half-open semantics filter `t =!= hiCol` on the result. Degenerate
  * intervals (lo > hi) match nothing under BETWEEN, so both operators
  * drop them BEFORE the explode — without that guard Spark's `sequence`
  * steps −1 from a start above its stop and a malformed row fans out
  * into a descending junk bin list (r9 ADVICE). Columns `ptCol`,
  * `loCol`, `hiCol` must be integral (epoch seconds for time ranges —
  * cast before calling); bins are computed with INTEGER floor division
  * (pmod-adjusted `div`, exact over the full int64 range — `floor(x/b)`
  * through DOUBLE is only exact below 2^53, which epoch micros exceed
  * within engineering horizons); `_bin` is reserved. */
object RangeJoin {

  /** floor(x / binSize) in pure long arithmetic: pmod brings x to the
    * floor multiple (correct for negative x where `div` truncates toward
    * zero), then the division is exact. */
  private def binOf(c: String, binSize: Long): Column =
    expr(s"(`$c` - pmod(`$c`, ${binSize}L)) div ${binSize}L")

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val ivb = intervals
      .where(col(loCol) <= col(hiCol)) // degenerate: matches nothing
      .withColumn("_bin",
        explode(sequence(binOf(loCol, binSize), binOf(hiCol, binSize))))
    val ptb = points.withColumn("_bin", binOf(ptCol, binSize))
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
    def binned(df: DataFrame, lo: String, hi: String) =
      df.where(col(lo) <= col(hi)) // degenerate: intersects nothing
        .withColumn("_bin",
          explode(sequence(binOf(lo, binSize), binOf(hi, binSize))))
    binned(a, loA, hiA).join(binned(b, loB, hiB), Seq("_bin"))
      .where(col(loA) <= col(hiB) && col(loB) <= col(hiA) &&
        col("_bin") === greatest(binOf(loA, binSize), binOf(loB, binSize)))
      .drop("_bin")
  }
}
