package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Funnel, Retention}

/** Funnel + cohort-retention semantics on hand-checkable event sets plus
  * a brute-force per-key replay on random data. */
class EventsAnalyticsSpec extends AnyFunSuite {
  import TestSession._

  private def ev(rows: (Long, Double, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("u", "t", "e")
  }

  test("funnel matches greedily from the earliest step-1 event") {
    // u1 completes all 3 in order; u2 clicks BEFORE its first view (no
    // credit); u3 views only; u4 has no step-1 event at all
    val df = ev(
      (1L, 10.0, "view"), (1L, 20.0, "click"), (1L, 30.0, "purchase"),
      (2L, 5.0, "click"), (2L, 8.0, "view"), (2L, 6.0, "purchase"),
      (3L, 1.0, "view"),
      (4L, 2.0, "purchase"))
    val stages = Funnel.funnelStages(df, "u", "t", "e",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages == Map("1" -> 3L, "2" -> 1L, "3" -> 1L))
    val counts = Funnel.funnelCounts(df, "u", "t", "e",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts == Map((1L, "view") -> 3L, (2L, "click") -> 1L,
      (3L, "purchase") -> 1L))
  }

  test("equal timestamps never chain (strictly-after contract)") {
    val df = ev((1L, 10.0, "view"), (1L, 10.0, "click"), (1L, 11.0, "click"))
    val stages = Funnel.funnelStages(df, "u", "t", "e", Seq("view", "click"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages == Map("1" -> 2L)) // the t=11 click, not the t=10 one
    val tight = Funnel.funnelStages(
      ev((1L, 10.0, "view"), (1L, 10.0, "click")), "u", "t", "e",
      Seq("view", "click"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight == Map("1" -> 1L))
  }

  test("per-step SLA gap drops late transitions") {
    val df = ev(
      (1L, 0.0, "view"), (1L, 50.0, "click"),
      (2L, 0.0, "view"), (2L, 200.0, "click"), (2L, 250.0, "purchase"))
    val stages = Funnel.funnelStages(df, "u", "t", "e",
      Seq("view", "click", "purchase"), maxStepGapSec = Some(100L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // u2's click is 200s after its view — outside the SLA, so it stays
    // at stage 1 even though a purchase follows within 100s of the click
    assert(stages == Map("1" -> 2L, "2" -> 1L))
  }

  test("funnel agrees with a brute-force per-key replay on random events") {
    val rnd = new scala.util.Random(11)
    val steps = Seq("a", "b", "c", "d")
    val rows = Seq.fill(2000)((rnd.nextInt(40).toLong,
      rnd.nextInt(500).toDouble, steps(rnd.nextInt(4))))
    val got = Funnel.funnelStages(ev(rows: _*), "u", "t", "e", steps)
      .collect().map(r => r.getString(0).toLong -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var stage = 0
      var tPrev = Double.NegativeInfinity
      for ((_, t, s) <- sorted if stage < steps.size)
        if (s == steps(stage) && (stage == 0 || t > tPrev)) {
          tPrev = t; stage += 1
        }
      if (stage == 0) None else Some(u -> stage.toLong)
    }
    assert(got == want)
  }

  test("count anomalies: spike flags, constant series yields null z") {
    val s = spark
    import s.implicits._
    val h = 3600.0
    // key "a": hourly counts 1,1,1,5 — the 5 is a spike; key "b":
    // constant 2,2 — zero variance, z must be null and not anomalous
    val rows =
      Seq.tabulate(1)(i => ("a", 0.5 * h)) ++ Seq(("a", 1.5 * h)) ++
        Seq(("a", 2.5 * h)) ++ Seq.fill(5)(("a", 3.5 * h)) ++
        Seq(("b", 0.5 * h), ("b", 0.6 * h), ("b", 1.5 * h), ("b", 1.6 * h))
    val df = rows.toDF("k", "t")
      .select(col("k"), col("t").cast("timestamp").as("ts"))
    val out = graft.operators.Anomaly.countAnomalies(df, "k", "ts",
      threshold = 1.5)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4)))
      .toMap
    // a: counts 1,1,1,5 → mean 2, var 3, sd √3: z(5) = 3/√3 = √3 ≈ 1.7321
    assert(out(("a", 5L)) == ((Some(1.7321), 1L)))
    assert(out(("a", 1L))._2 == 0L)
    assert(out(("b", 2L)) == ((None, 0L)))
  }

  test("transition matrix: counts and row-normalized probabilities") {
    val s = spark
    import s.implicits._
    // per-user ordered paths: u1 a→b→a, u2 a→b, u3 a→c
    val df = Seq(
      (1L, 1.0, "a", 1L), (1L, 2.0, "b", 2L), (1L, 3.0, "a", 3L),
      (2L, 1.0, "a", 4L), (2L, 2.0, "b", 5L),
      (3L, 1.0, "a", 6L), (3L, 2.0, "c", 7L))
      .toDF("u", "t", "e", "id")
    val got = Funnel.transitionCounts(df, "u", "t", "e", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      ("a", "b") -> (2L, 0.666667), ("a", "c") -> (1L, 0.333333),
      ("b", "a") -> (1L, 1.0)))
  }

  test("retention cohorts: offset-0 row is the cohort size, pct scales") {
    val s = spark
    import s.implicits._
    val wk = 604800.0
    // users 1,2 first-seen week 0 (user 2 returns week 1); user 3 first-
    // seen week 1 and returns week 3
    val df = Seq(
      (1L, 0.5 * wk), (2L, 0.9 * wk), (2L, 1.5 * wk),
      (3L, 1.1 * wk), (3L, 3.0 * wk))
      .toDF("u", "ts")
      .select(col("u"), col("ts").cast("timestamp").as("ts"))
    val got = Retention.cohortRetention(df, "u", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      (0L, 0L) -> (2L, 1.0), (0L, 1L) -> (1L, 0.5),
      (1L, 0L) -> (1L, 1.0), (1L, 2L) -> (1L, 1.0)))
  }
}
