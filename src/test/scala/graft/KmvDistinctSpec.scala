package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.KmvDistinct

class KmvDistinctSpec extends AnyFunSuite {
  import TestSession._

  private def table(rows: (String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("g", "key")
  }

  test("below k the sketch is exact, duplicates ignored") {
    val d = table(
      ("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 10L))
    val out = KmvDistinct.approxDistinct(d, col("key"), Seq(col("g")), k = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 1L))
  }

  test("at/above k the estimate replays the (k-1)(M+1)/(h_k+1) formula") {
    val keys = (1L to 500L)
    val d = {
      val s = spark
      import s.implicits._
      keys.map(("a", _)).toDF("g", "key").repartition(7) // exercise merge
    }
    val k = 16
    val got = KmvDistinct.approxDistinct(d, col("key"), Seq(col("g")), k = k)
      .head().getLong(1)
    // driver-side replay of the exact same deterministic arithmetic
    val hk = keys.map(x => ((x % KmvDistinct.M) * KmvDistinct.A + 7L * 40503L)
        % KmvDistinct.M)
      .distinct.sorted.apply(k - 1)
    val expect = (k - 1).toLong * (KmvDistinct.M + 1) / (hk + 1)
    assert(got == expect)
    // and the estimate is in the right ballpark for a k=16 sketch
    assert(got > 250 && got < 1000, s"estimate $got wildly off 500")
  }
}
