package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.tools.Print

/** The reference's print() formats (`src/keyvalue.cpp:773-830`): exact
  * line shape, per-flag rendering and byte sizes, stride, proc filter,
  * and the two file modes. (One divergence, documented: Java's %g keeps
  * trailing zeros where C's strips them — the type interpretation, not
  * printf trivia, is the capability.) */
class PrintSpec extends AnyFunSuite {
  import TestSession._

  private def kv2 = {
    val s = spark
    import s.implicits._
    Seq((7L, "alpha"), (9L, "beta")).toDF("k", "v").repartition(1)
  }

  test("kflag=2 vflag=5 renders uint64 key / string value with C sizes") {
    val got = Print.lines(kv2, kflag = 2, vflag = 5,
      Seq(col("k")), Seq(col("v"))).collect().sorted
    assert(got.toSeq == Seq(
      "KV pair: proc 0, sizes 8 5, key 9, value beta",
      "KV pair: proc 0, sizes 8 6, key 7, value alpha"))
  }

  test("pair flags render two columns; NULL flag renders NULL") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 2, 3L, 4L)).toDF("a", "b", "c", "d").repartition(1)
    val got = Print.lines(df, kflag = 6, vflag = 7,
      Seq(col("a"), col("b")), Seq(col("c"), col("d"))).head()
    assert(got == "KV pair: proc 0, sizes 8 16, key 1 2, value 3 4")
    val nul = Print.lines(df, kflag = 0, vflag = 1,
      Seq(col("a")), Seq(col("b"))).head()
    assert(nul == "KV pair: proc 0, sizes 0 4, key NULL, value 2")
  }

  test("nstride keeps every Nth pair per partition") {
    val s = spark
    import s.implicits._
    val df = (1 to 10).map(i => (i, i)).toDF("k", "v").repartition(1)
    val got = Print.lines(df, 1, 1, Seq(col("k")), Seq(col("v")), nstride = 3)
    assert(got.count() == 3) // pairs 3, 6, 9
  }

  test("proc filter keeps a single partition; toFiles fflag modes") {
    val s = spark
    import s.implicits._
    val df = (1 to 8).map(i => (i, i)).toDF("k", "v").repartition(4)
    val one = Print.lines(df, 1, 1, Seq(col("k")), Seq(col("v")), proc = 2)
      .collect()
    assert(one.nonEmpty && one.forall(_.startsWith("KV pair: proc 2,")))
    val dir = java.nio.file.Files.createTempDirectory("printspec").toString
    Print.toFiles(df, s"$dir/multi", fflag = 1, 1, 1, Seq(col("k")), Seq(col("v")))
    Print.toFiles(df, s"$dir/single", fflag = 0, 1, 1, Seq(col("k")), Seq(col("v")))
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts(s"$dir/multi") == 4)
    assert(parts(s"$dir/single") == 1)
  }
}
