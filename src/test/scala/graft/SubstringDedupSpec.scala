package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TokenGramHashes
import graft.llm.Dedup

/** Sequence-level (substring) dedup: the rolling gram-hash expression,
  * cross-document repeated-span extraction, and span excision. */
class SubstringDedupSpec extends AnyFunSuite {
  import TestSession._

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // planted fixture: A and B share the 12-token passage P and nothing
  // else; C is unique; D repeats a 6-token run twice WITHIN itself only.
  private val P = (1 to 12).map(i => s"p$i").mkString(" ")
  private val innerQ = (1 to 6).map(i => s"q$i").mkString(" ")
  private val fixture = docs(
    (1L, s"a1 a2 a3 $P a4 a5"),
    (2L, s"b1 $P b2 b3 b4"),
    (3L, (1 to 20).map(i => s"c$i").mkString(" ")),
    (4L, s"d1 $innerQ d2 $innerQ"))

  test("token_gram_hashes: rolling hashes equal a direct per-gram recompute") {
    val s = spark
    import s.implicits._
    val text = "w1 w2  w3 w4 w5 w6" // double space: empty token skipped
    val hashes = Seq(text).toDF("t")
      .select(TokenGramHashes.gramHashes(split(col("t"), "\\s+"), 3, 7L))
      .head().getSeq[Long](0)
    assert(hashes.length == 4) // 6 tokens, L=3 → 4 positions
    // direct recompute of position p: Σ tokenHash · B^(L-1-j)
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val B = TokenGramHashes.GramBase
    def direct(p: Int): Long = (0 until 3).foldLeft(0L) { (h, j) =>
      h * B + TokenGramHashes.tokenHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(toks(p + j)), 7L)
    }
    assert(hashes == (0 until 4).map(direct))
  }

  test("token_gram_hashes: null under L tokens; equal grams hash equal across docs") {
    val s = spark
    import s.implicits._
    val out = Seq((1L, "x y"), (2L, "one two three"), (3L, "zz one two three"))
      .toDF("id", "t")
      .select(col("id"),
        TokenGramHashes.gramHashes(split(col("t"), "\\s+"), 3, 1L).as("g"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Long](1)).getOrElse(Seq.empty)).toMap
    assert(out(1L).isEmpty)                 // 2 tokens < L=3 → null
    assert(out(2L).length == 1 && out(3L).length == 2)
    assert(out(2L).head == out(3L)(1))      // same gram, different position
    assert(out(3L).head != out(3L)(1))      // different grams differ
  }

  test("repeatedSpans finds the maximal shared passage, cross-document only") {
    val spans = Dedup.repeatedSpans(fixture, "text", "doc_id", spanLen = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // A: P occupies tokens 4-15; B: tokens 2-13. D's within-doc repeat
    // and C must be absent.
    assert(spans == Set((1L, 4L, 15L, 12L), (2L, 2L, 13L, 12L)))
  }

  test("exciseRepeatedSpans removes covered tokens and normalizes whitespace") {
    val out = Dedup.exciseRepeatedSpans(fixture, "text", "doc_id", spanLen = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a1 a2 a3 a4 a5", 12L)))
    assert(out(2L) == (("b1 b2 b3 b4", 12L)))
    assert(out(3L) == (((1 to 20).map(i => s"c$i").mkString(" "), 0L)))
    assert(out(4L) == ((s"d1 $innerQ d2 $innerQ", 0L)))
  }

  test("keepOne excision: the min-id owner keeps its copy, others lose theirs") {
    val out = Dedup.exciseRepeatedSpans(fixture, "text", "doc_id",
      spanLen = 5, keepOne = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 1 is the owner of every shared gram (min id) → keeps P intact
    assert(out(1L) == ((s"a1 a2 a3 $P a4 a5", 0L)))
    // doc 2 loses its copy of P
    assert(out(2L) == (("b1 b2 b3 b4", 12L)))
    assert(out(3L)._2 == 0L)
    assert(out(4L)._2 == 0L)
  }

  test("ExciseTokens: unsorted/overlapping spans, empty tokens, empty spans") {
    val s = spark
    import s.implicits._
    def run(text: String, spans: Seq[(Long, Long)]): Seq[String] = {
      val spanCol =
        if (spans.isEmpty)
          expr("CAST(array() AS array<struct<s: bigint, e: bigint>>)")
        else array(spans.map { case (a, b) =>
          struct(lit(a).as("s"), lit(b).as("e")) }: _*)
      Seq(text).toDF("t")
        .select(graft.functions.ExciseTokens.excise(
          split(col("t"), "\\s+"), spanCol))
        .head().getSeq[String](0)
    }
    // unsorted + overlapping spans cover 2-5; double space skips an empty
    assert(run("w1 w2  w3 w4 w5 w6", Seq((4L, 5L), (2L, 4L))) == Seq("w1", "w6"))
    assert(run("w1 w2 w3", Seq.empty) == Seq("w1", "w2", "w3"))
    assert(run("w1 w2 w3", Seq((1L, 3L))) == Seq.empty)
    // span beyond the token range is harmless
    assert(run("w1 w2", Seq((5L, 9L))) == Seq("w1", "w2"))
  }

  test("repeatedSpans merges overlapping spans from different partners") {
    // X shares its first 6 tokens with Y and tokens 4-9 with Z: the two
    // duplicated gram runs on X overlap → ONE maximal span 1-9.
    val d = docs(
      (10L, "s1 s2 s3 t1 t2 t3 u1 u2 u3"),
      (11L, "s1 s2 s3 t1 t2 t3 zz1 zz2 zz3"),
      (12L, "yy1 yy2 yy3 t1 t2 t3 u1 u2 u3"))
    val spans = Dedup.repeatedSpans(d, "text", "doc_id", spanLen = 6)
      .where(col("doc_id") === 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 9L)))
  }
}
