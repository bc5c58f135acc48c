package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** The native dot-product expression must be a drop-in replacement for the
  * `aggregate(zip_with(...))` fold it displaced: bitwise-identical sums
  * (the DuckDB list_sum oracles depend on the fold order) and the same
  * null propagation. */
class DotProductSpec extends AnyFunSuite {
  import TestSession._

  test("matches the HOF aggregate fold bitwise (codegen, no fallback)") {
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(7)
      val rows = Seq.fill(50)(
        (Seq.fill(64)(rnd.nextDouble()), Seq.fill(64)(rnd.nextDouble())))
      val both = rows.toDF("a", "b").select(
        DotProduct.dot(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("hof"))
        .collect()
      both.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("null array, length mismatch, and null element all yield null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Option(Seq(Option(1.0), Option(2.0))), Option(Seq(Option(3.0), Option(4.0)))),
      (Option.empty[Seq[Option[Double]]], Option(Seq(Option(1.0)))),
      (Option(Seq(Option(1.0))), Option(Seq(Option(1.0), Option(2.0)))),
      (Option(Seq(Option(1.0), Option.empty[Double])), Option(Seq(Option(1.0), Option(2.0)))))
      .toDF("a", "b")
    val out = df.select(DotProduct.dot(col("a"), col("b")).as("d")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(11.0), None, None, None))
  }

  test("interpreted eval agrees with codegen") {
    val e = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4.0, 5.0, 6.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 32.0)
  }
}
