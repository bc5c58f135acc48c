package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CountMin

class CountMinSpec extends AnyFunSuite {
  import TestSession._

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("estimates are exact at wide width, overcount-only, fused at width 1") {
    val d = docs((1L, "a a a b b c"), (2L, "a b c d"))
    // 2^20 buckets over 4 distinct words: no collisions (deterministic
    // for THESE words — the hash is fixed), so every estimate is exact
    val wide = CountMin.heavyHitters(d, "text", topK = 10, depth = 4,
        width = 1 << 20, seed = 11L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(wide == Map("a" -> ((4L, 4L)), "b" -> ((3L, 3L)),
      "c" -> ((2L, 2L)), "d" -> ((1L, 1L))))
    // width 1 folds EVERY word into one cell per row: each estimate is
    // the total token count — the extreme of the overcount-only bound
    val fused = CountMin.heavyHitters(d, "text", topK = 10, depth = 4,
      width = 1, seed = 11L).collect()
    assert(fused.length == 4)
    assert(fused.forall(_.getLong(2) == 10L))
  }

  test("estimate never undercounts at contentious widths") {
    // 40 distinct words into 8 buckets: collisions guaranteed; the CMS
    // invariant est >= exact must hold for every probe
    val text = (0 until 40).map(i => s"w$i " * (i % 5 + 1)).mkString(" ")
    val d = docs((1L, text))
    val hh = CountMin.heavyHitters(d, "text", topK = 40, depth = 2,
      width = 8, seed = 11L).collect()
    assert(hh.length == 40)
    hh.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // and at least one probe actually overcounts (collisions exist)
    assert(hh.exists(r => r.getLong(2) > r.getLong(1)))
  }
}
