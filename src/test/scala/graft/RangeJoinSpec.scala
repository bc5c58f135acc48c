package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** operators.RangeJoin: bin-bucketed point-in-interval join — exactness
  * (inclusive bounds, one row per match regardless of how many bins an
  * interval spans) and the no-nested-loop plan shape. */
class RangeJoinSpec extends AnyFunSuite {
  import TestSession._

  private def run(binSize: Long) = {
    val s = spark
    import s.implicits._
    val pts = Seq(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> 15L)
      .toDF("pid", "t")
    val iv = Seq((100L, 3L, 12L), (200L, 5L, 10L)).toDF("iid", "lo", "hi")
    graft.operators.RangeJoin.pointInInterval(pts, iv, "t", "lo", "hi", binSize)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private val expected = Set((2L, 100L), (3L, 100L), (2L, 200L), (3L, 200L))

  test("inclusive bounds; exact matches at a coarse bin") {
    assert(run(binSize = 100L) == expected)
  }

  test("multi-bin intervals emit each match exactly once") {
    // binSize 4: [3,12] covers bins 0..3, [5,10] bins 1..2 — result
    // must be identical to the single-bin run, with no duplicates
    val s = spark
    import s.implicits._
    val pts = Seq(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> 15L).toDF("pid", "t")
    val iv = Seq((100L, 3L, 12L), (200L, 5L, 10L)).toDF("iid", "lo", "hi")
    val rows = graft.operators.RangeJoin
      .pointInInterval(pts, iv, "t", "lo", "hi", binSize = 4L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.size == rows.distinct.size, s"duplicate matches: $rows")
    assert(rows.toSet == expected)
  }

  test("interval overlap: closed-interval semantics, once per pair across bins") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 0L, 9L), (2L, 20L, 30L), (3L, 35L, 36L))
      .toDF("ia", "lo_a", "hi_a")
    val b = Seq((10L, 9L, 25L), (20L, 31L, 40L)).toDF("ib", "lo_b", "hi_b")
    // truth: (1,10) touch at 9 (closed bounds), (2,10) overlap [20,25],
    // (3,20) inside [31,40]; (2,20) disjoint (30 < 31)
    val expected = Set((1L, 10L), (2L, 10L), (3L, 20L))
    for (bin <- Seq(4L, 7L, 100L)) {
      val rows = graft.operators.RangeJoin
        .intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b", bin)
        .select(col("ia"), col("ib"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.size == rows.distinct.size,
        s"bin=$bin produced duplicates: $rows")
      assert(rows.toSet == expected, s"bin=$bin: $rows")
    }
  }

  test("the join plans as an equi-join on bin, never a nested loop") {
    val s = spark
    import s.implicits._
    val pts = Seq(1L -> 0L).toDF("pid", "t")
    val iv = Seq((100L, 3L, 12L)).toDF("iid", "lo", "hi")
    val p = graft.operators.RangeJoin
      .pointInInterval(pts, iv, "t", "lo", "hi", binSize = 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join must lower to an equi-join on bin:\n$p")
  }
}
