package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

class ProfileSpec extends AnyFunSuite {
  import TestSession._

  test("profile reports rows/nonnull/distinct/min/max per column, one row each") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("a"), 10),
      (2L, None, 30),
      (3L, Some("b"), 10),
      (4L, Some("a"), 20)
    ).toDF("id", "tag", "v")
    val got = Profile.profile(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    assert(got.keySet == Set("id", "tag", "v"))
    assert(got("id") == ((4L, 4L, 4L, "1", "4")))
    // count(tag) skips the null; distinct over non-null values only
    assert(got("tag") == ((4L, 3L, 2L, "a", "b")))
    assert(got("v") == ((4L, 4L, 3L, "10", "30")))
  }

  test("profile is a single aggregate: no joins, expand + partial agg") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val p = Profile.profile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"multi-distinct must Expand, not join:\n$p")
    assert(!p.contains("Join"), s"profiling must not join:\n$p")
  }

  test("correlation matrix: ±1 on linear columns, null on constants, one pass") {
    val s = TestSession.spark
    import s.implicits._
    // b = 2a (corr 1), c = -a (corr -1), d constant (undefined)
    val df = (1 to 20).map(i => (i.toDouble, 2.0 * i, -i.toDouble, 5.0))
      .toDF("a", "b", "c", "d")
    val out = Profile.correlationMatrix(df, Seq("a", "b", "c", "d"))
    val m = out.collect().map(r => (r.getString(0), r.getString(1)) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(m(("a", "b")) == Some(1.0) && m(("a", "c")) == Some(-1.0) &&
      m(("b", "c")) == Some(-1.0))
    assert(m(("a", "d")).isEmpty && m(("b", "d")).isEmpty && m(("c", "d")).isEmpty)
    // one Aggregate, no joins
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"the matrix must come from one agg pass:\n$p")
  }
}
