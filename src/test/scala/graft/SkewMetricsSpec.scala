package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Skew
import graft.tools.QueryMetrics

class SkewMetricsSpec extends AnyFunSuite {
  import TestSession._

  test("saltedAgg equals direct groupBy for sum/count") {
    val li = Tables.lineitem(spark, sf0001)
    val salted = Skew.saltedAgg(li, col("l_returnflag"), salts = 8)(
      Seq(sum(col("l_quantity")).as("s"), count(lit(1)).as("c")),
      Seq(sum(col("s")).as("s"), sum(col("c")).as("c")))
    val direct = li.groupBy(col("l_returnflag").as("_k"))
      .agg(sum(col("l_quantity")).as("s2"), count(lit(1)).as("c2"))
    val joined = salted.join(direct, "_k")
    assert(joined.where(abs(col("s") - col("s2")) > 1e-9 || col("c") =!= col("c2"))
      .count() == 0)
    assert(salted.count() == direct.count())
  }

  test("saltedDistinct equals distinct") {
    val df = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_linestatus"))
    assert(Skew.saltedDistinct(df, 8).count() == df.distinct().count())
  }

  test("QueryMetrics captures input records and shuffle bytes") {
    val li = Tables.lineitem(spark, sf0001)
    val (n, m) = QueryMetrics.measure(spark,
      li.groupBy(col("l_orderkey")).agg(sum(col("l_quantity"))))
    assert(n > 0)
    assert(m("records_read") > 0)
    assert(m("shuffle_write_bytes") > 0)
  }

  test("kvStatsByPartition totals equal global kvStats; histogram covers all partitions") {
    import graft.core.MrOps
    val df = spark.range(0, 1000, 1, 7).toDF("k")
      .withColumn("s", concat(lit("val_"), col("k")))
    val sizeCols = Seq(col("k"), col("s"))
    val global = MrOps.kvStats(df, sizeCols).head()
    val per = MrOps.kvStatsByPartition(df, sizeCols)
    val perRows = per.collect()
    assert(perRows.length == 7, "one row per partition")
    assert(perRows.map(_.getLong(1)).sum == global.getLong(0))
    assert(perRows.map(_.getLong(2)).sum == global.getLong(1))
    val histo = MrOps.kvStatsHisto(per).collect()
    assert(histo.map(_.getLong(1)).sum == 7, "histogram mass = #partitions")
  }

  test("SimHashFp expression matches the reference bit-sum semantics") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val s = spark
      import s.implicits._
      val d = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
      val got = graft.llm.Dedup.simHash(d, "text", "doc_id").head().getLong(1)
      // independent driver-side replay of the portable formulas (rolling
      // polynomial word hash; premix + double middle-square bit signs) —
      // written out inline, NOT by calling the SimHashFp helpers
      val M = 1000000007L
      def wordHash(w: String): Long =
        w.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 257L + (b & 0xff)) % M)
      val counts = new Array[Int](64)
      Seq("alpha", "beta", "alpha").foreach { w =>
        val h = wordHash(w)
        (0 until 64).foreach { b =>
          val g = (h * 2654435761L + 40503L * (b + 1)) % M
          val s2 = { val s1 = g * g % M; s1 * s1 % M }
          if (((s2 >> 15) & 1L) == 0L) counts(b) += 1 else counts(b) -= 1
        }
      }
      val expect = (0 until 64).foldLeft(0L)((acc, b) =>
        if (counts(b) > 0) acc | (1L << b) else acc)
      assert(got == expect)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
