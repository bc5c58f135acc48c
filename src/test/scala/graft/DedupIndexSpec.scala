package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Sampling}
import graft.sources.DedupIndex

/** The persisted band index must answer exactly what the in-memory
  * incremental dedup answers, with the corpus side served from storage
  * shuffle-free — and appends must make admitted docs first-class
  * corpus members for the next batch. */
class DedupIndexSpec extends AnyFunSuite {
  import TestSession._

  private def fixtureSplit() = {
    val docs = Tables.documents(spark, sf0001)
    val fresh = Sampling.hashSample(docs, "doc_id", 0.2)
    val corpus = docs.join(fresh.select(col("doc_id")), Seq("doc_id"),
      "left_anti")
    (docs, fresh, corpus)
  }

  test("stored-index dedup equals in-memory incrementalDedup row-for-row") {
    val (_, fresh, corpus) = fixtureSplit()
    DedupIndex.build(spark, corpus, "text", "doc_id", "graft_dedup_spec")
    val stored = DedupIndex.dedupAgainst(spark, "graft_dedup_spec", fresh,
      "text", "doc_id").collect().map(_.toSeq).toSet
    val mem = Dedup.incrementalDedup(fresh, corpus, "text", "doc_id",
      portable = true).collect().map(_.toSeq).toSet
    assert(stored == mem && stored.nonEmpty)
  }

  test("the candidate probe never shuffles the stored bands side") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val (_, fresh, corpus) = fixtureSplit()
    DedupIndex.build(spark, corpus, "text", "doc_id", "graft_dedup_spec2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = DedupIndex.dedupAgainst(spark, "graft_dedup_spec2", fresh,
        "text", "doc_id")
      df.count()
      val shuffledStored = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
            if e.child.toString.contains("graft_dedup_spec2_bands") => e
      }
      assert(shuffledStored.isEmpty,
        s"the stored band postings must join on their bucket key " +
          s"without an Exchange:\n${df.queryExecution.executedPlan}")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("append makes admitted docs corpus members: a re-crawl is rejected") {
    val (_, fresh, corpus) = fixtureSplit()
    DedupIndex.build(spark, corpus, "text", "doc_id", "graft_dedup_spec3")
    val admitted = DedupIndex.dedupAgainst(spark, "graft_dedup_spec3",
      fresh, "text", "doc_id").localCheckpoint()
    DedupIndex.append(spark, "graft_dedup_spec3", admitted, "text",
      "doc_id")
    // the same admitted docs re-crawled under NEW ids are exact dups of
    // what was just appended — the index must now reject every one that
    // has >= 3 words (short docs have no bands/shingles by contract)
    val recrawl = admitted
      .withColumn("doc_id", col("doc_id") + 5000000L)
      .where(size(split(col("text"), "\\s+")) >= 3)
    val secondPass = DedupIndex.dedupAgainst(spark, "graft_dedup_spec3",
      recrawl, "text", "doc_id")
    assert(recrawl.count() > 0 && secondPass.count() == 0,
      s"re-crawled duplicates of appended docs must be rejected " +
        s"(${secondPass.count()} of ${recrawl.count()} admitted)")
  }
}
