package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** As-of join semantics on hand-checkable data plus a brute-force
  * cross-check (range join + argmax) on a larger random set. */
class AsofJoinSpec extends AnyFunSuite {
  import TestSession._

  test("picks the latest right row at or before each left ts, null when none") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 25L, "p2"), (1L, 5L, "p0"), (2L, 7L, "x"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 50L, 900L))
      .toDF("k", "t", "fid")
    val out = AsofJoin.asof(left, right, "k", "t", Seq("fid"))
      .select(col("tag"), col("asof_fid")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // p1 at t=10 sees the simultaneous right row (at-or-before); p0 has
    // no preceding right row; user 2's only right row is in the future
    assert(out == Map("p1" -> 100L, "p2" -> 200L, "p0" -> -1L, "x" -> -1L))
  }

  test("agrees with the brute-force range-join argmax on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val left = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("lid", "k", "t")
    val right = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .distinct // unique (k, t) per the operator contract
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "t", "fid")
    val got = AsofJoin.asof(left, right, "k", "t", Seq("fid"))
      .select(col("lid"), col("asof_fid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val brute = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("lid"))
      .agg(max(struct(col("r.t"), col("fid"))).as("m"))
      .select(col("lid"), col("m.fid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == brute)
  }
}
