package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  import TestSession._

  test("facade runs registered capabilities by name and lists the surface") {
    val e = new Engine(spark)
    assert(e.query("q1_agg", sf0001).count() > 0)
    assert(e.queryNames.size == Registry.all.size)
    assert(e.queryNames.distinct.size == e.queryNames.size)
    assert(e.oracleCheckedNames.size >= e.queryNames.size - 2,
      "at most two rows-only capabilities")
    assert(spark.sql("SELECT vec_dot(array(1.0d), array(2.0d))").head().getDouble(0) == 2.0)
    intercept[NoSuchElementException](e.query("q_nope", sf0001))
  }
}
