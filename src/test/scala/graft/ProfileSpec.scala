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
}
