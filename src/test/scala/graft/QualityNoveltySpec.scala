package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, TextAnalysis}

/** Gopher rule gate + n-gram novelty semantics on hand-built docs. */
class QualityNoveltySpec extends AnyFunSuite {
  import TestSession._

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("gopher rules flag the specific violated rule") {
    val good = (1 to 30).map(i => s"the quick brown fox item$i").mkString(" ")
    val short = "the quick brown fox"                       // < 20 words
    val rep = ("spam " * 30).trim + " the of and in is extra words here now ok"
    val noStop = (1 to 25).map(i => s"token$i").mkString(" ")
    val out = TextAnalysis.gopherRules(
      docs((1L, good), (2L, short), (3L, rep), (4L, noStop)),
      "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // (r_words, r_word_len, r_stopwords, r_symbols, r_repetition, n_failed, pass)
    assert(out(1L) == ((1L, 1L, 1L, 1L, 1L, 0L, 1L)))
    assert(out(2L)._1 == 0L && out(2L)._7 == 0L)            // too short
    assert(out(3L)._5 == 0L && out(3L)._7 == 0L)            // 30/40 = spam
    assert(out(4L)._3 == 0L && out(4L)._7 == 0L)            // no stopwords
  }

  test("cluster split keeps near-dups together; dup weights sum to 1") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs((1L, dup), (2L, dup),
      (3L, "one two three four five six seven eight nine ten"))
    val split = Dedup.clusterSplit(d, "text", "doc_id",
      Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the identical pair shares a cluster (min id) and thus a split
    assert(split(1L)._1 == 1L && split(2L)._1 == 1L)
    assert(split(1L)._2 == split(2L)._2)
    assert(split(3L)._1 == 3L)
    val w = Dedup.dupWeights(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(w(1L) == ((2L, 0.5)) && w(2L) == ((2L, 0.5)) && w(3L) == ((1L, 1.0)))
  }

  test("novelty: shared 8-gram spans lower the ratio; short docs drop") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"  // 8 tokens
    val a = shared + " aone atwo athree afour bfive"              // 13 tokens
    val b = shared + " bone btwo bthree bfour afive"
    val c = "cone ctwo cthree cfour cfive csix cseven ceight cnine"
    val tiny = "one two three"                                    // < 8 tokens
    val out = Dedup.noveltyScore(
      docs((1L, a), (2L, b), (3L, c), (4L, tiny)), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // a and b each have 6 distinct 8-grams; exactly one (the shared
    // leading window) appears in both docs -> 5/6 novel
    assert(out(1L) == ((6L, 0.833333)))
    assert(out(2L) == ((6L, 0.833333)))
    assert(out(3L) == ((2L, 1.0)))
    assert(!out.contains(4L))
  }
}
