package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** The one-scan TextStats expression must agree exactly with the
  * higher-order-function + regex formulation it replaced, including on
  * multi-byte characters and whitespace/punctuation edge cases. */
class TextStatsSpec extends AnyFunSuite {
  import TestSession._

  test("RepetitionStats matches a driver-side re-derivation (codegen on)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(11)
      val vocab = Seq("the", "cat", "sat", "mat", "a", "é€")
      val texts = Seq.fill(40)(
        Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")) ++
        Seq("", "   ", "one", "x x x x", "a b a b a", "tab\tsep  runs")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = df.select(col("doc_id"),
        graft.functions.RepetitionStats.repetitionStats(col("text")).as("st"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val words = t.split("\\s+").filter(_.nonEmpty).toSeq
        val bigrams = words.sliding(2).filter(_.size == 2)
          .map(_.mkString(" ")).toSeq
        val wc = words.groupBy(identity).view.mapValues(_.size.toLong)
        val bc = bigrams.groupBy(identity).view.mapValues(_.size.toLong)
        val expect = Seq(words.size.toLong, wc.size.toLong,
          if (wc.isEmpty) 0L else wc.values.max,
          bigrams.size.toLong,
          if (bc.isEmpty) 0L else bc.values.max)
        assert(got(i.toLong) === expect, s"doc $i: '$t'")
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("matches the HOF/regex formulation (codegen, no fallback)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(3)
      val alphabet = "ab c\t\nd,.!_09Z  é€"
      val texts = Seq.fill(60)(
        (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
        Seq("", "   ", "the a of x", "the, a.", "é é é", "_x_ the", "a_b.c__d")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val ws = filter(split(col("text"), "\\s+"), w => length(w) > 0)
      val got = df.select(col("doc_id"),
        graft.functions.TextStats.textStats(col("text"), TextAnalysis.stopwords).as("st"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      val ref = df.select(col("doc_id"),
        size(ws).cast("long").as("ws"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
          .cast("long").as("bpe"),
        length(col("text")).cast("long").as("chars"),
        aggregate(transform(ws, w => length(w).cast("long")), lit(0L),
          (a, x) => a + x).as("wlen"),
        size(filter(ws, w => w.isInCollection(TextAnalysis.stopwords)))
          .cast("long").as("stop"),
        size(regexp_extract_all(col("text"), lit("[^\\w\\s]"), lit(0)))
          .cast("long").as("punct"))
        .collect()
        .map(r => r.getLong(0) -> (1 to 6).map(r.getLong).toSeq).toMap
      texts.indices.foreach { i =>
        assert(got(i.toLong) == ref(i.toLong),
          s"doc $i: '${texts(i).take(60)}' native=${got(i.toLong)} ref=${ref(i.toLong)}")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
