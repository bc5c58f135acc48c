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

  test("SimHashFp expression matches the reference bit-sum semantics") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val s = spark
      import s.implicits._
      val d = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
      val got = graft.llm.Dedup.simHash(d, "text", "doc_id").head().getLong(1)
      // driver-side reference
      val words = Seq("alpha", "beta", "alpha").map(UTF8String.fromString)
      val counts = new Array[Int](64)
      words.foreach { w =>
        val h = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
        (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1)
      }
      val expect = (0 until 64).foldLeft(0L)((acc, b) =>
        if (counts(b) > 0) acc | (1L << b) else acc)
      assert(got == expect)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
