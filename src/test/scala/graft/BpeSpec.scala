package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE merge training + encoding on hand-computed fixtures: classic
  * most-frequent-pair selection, GREEDY left-to-right merge
  * application (the overlap case), deterministic tie-break, and OOV
  * symbol handling in the encode summary. */
class BpeSpec extends AnyFunSuite {
  import TestSession._

  test("learns most-frequent pairs in order on the classic example") {
    val s = spark
    import s.implicits._
    val docs = Seq("ab ab abc").toDF("text")
    val (merges, types) = Bpe.train(docs, "text", rounds = 2)
    types.unpersist()
    assert(merges.map(m => (m.round, m.lhs, m.rhs, m.count)) ==
      Seq((1, "a", "b", 3L), (2, "ab", "c", 1L)))
  }

  test("merge application is greedy left-to-right (overlap case)") {
    val s = spark
    import s.implicits._
    // aaaa -> [aa][aa], aaa -> [aa][a]: round 1 merges (a,a) count 5;
    // round 2 ties (aa,a)=1 vs (aa,aa)=1 -> lexical tie-break picks
    // rhs "a" < "aa"
    val docs = Seq("aaaa aaa").toDF("text")
    val (merges, types) = Bpe.train(docs, "text", rounds = 2)
    val segs = types.select("w", "ss").as[(String, String)].collect().toMap
    types.unpersist()
    assert(merges.head.lhs == "a" && merges.head.rhs == "a" &&
      merges.head.count == 5L)
    assert(merges(1).lhs == "aa" && merges(1).rhs == "a")
    assert(segs("aaaa") == " aa  aa ")
    assert(segs("aaa") == " aaa ")
  }

  test("encode summary counts OOV symbols and checksums positions") {
    val s = spark
    import s.implicits._
    val train = Seq("ab ab").toDF("text")
    val (merges, types) = Bpe.train(train, "text", rounds = 1)
    val sv = Bpe.symbolVocab(types)
    // trained inventory is the single merged symbol "ab" -> id 1
    assert(sv.as[(String, Long)].collect().toSeq == Seq(("ab", 1L)))
    val docs = Seq((7L, "ab xz")).toDF("doc_id", "text")
    val out = Bpe.encodeSummary(docs, "text", "doc_id", merges, sv)
      .as[(Long, Long, Long, Long)].collect().toSeq
    types.unpersist()
    // "ab" -> [ab](id 1): 1*1*(1+7) = 8
    // "xz" -> [x][z](OOV id 0): 2*1*7 + 2*2*7 = 42
    assert(out == Seq((7L, 3L, 2L, 50L)))
  }

  test("encoding a word with unseen chars falls back to characters") {
    val s = spark
    import s.implicits._
    val train = Seq("ee ee e").toDF("text")
    val (merges, types) = Bpe.train(train, "text", rounds = 1)
    val sv = Bpe.symbolVocab(types)
    val docs = Seq((1L, "eee qq")).toDF("doc_id", "text")
    val row = Bpe.encodeSummary(docs, "text", "doc_id", merges, sv)
      .as[(Long, Long, Long, Long)].collect().head
    types.unpersist()
    // eee -> [ee][e] (both trained), qq -> [q][q] both OOV
    assert(row._2 == 4L && row._3 == 2L)
  }
}
