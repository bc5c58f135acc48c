package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The scale claims in SCALE.md, enforced: these tests fail if a change
  * regresses pushdown, broadcast choice, top-K lowering, or the
  * zero-shuffle property of the native signature expressions. */
class PlanShapeSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("filters and projection reach the parquet scan") {
    val p = plan("q_scan_project")
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      s"filter must push to the scan:\n$p")
    assert(!p.contains("l_comment"), "untouched columns must be pruned")
  }

  test("dimension joins broadcast") {
    val p = plan("q_join_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"nation/region joins must broadcast:\n$p")
  }

  test("top-K lowers to TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected local top-K + merge:\n$p")
  }

  test("native signature expressions are zero-shuffle projections") {
    val docs = Tables.documents(spark, sf0001)
    val sig = graft.llm.Dedup.minHashSignatures(docs, "text", "doc_id")
    assert(!sig.queryExecution.executedPlan.toString.contains("Exchange"),
      "minhash signatures must not shuffle")
    val win = graft.llm.TextAnalysis.winnowFingerprint(docs, "text", "doc_id")
    assert(!win.queryExecution.executedPlan.toString.contains("Exchange"),
      "winnow fingerprints must not shuffle")
  }

  test("embedding bucket projection stays codegen'd on raw float vectors") {
    val emb = Tables.embeddings(spark, sf0001)
    val p = emb.select(col("vec_id"),
      graft.llm.Similarity.lshBucket(col("embedding"), dim = 64, nPlanes = 4)
        .as("bucket"))
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"bucketing must stay inside whole-stage codegen:\n$p")
  }

  test("no registered query plans a CartesianProduct; BNLJ only where intended") {
    // Registry-wide audit: an unconstrained crossJoin anywhere in the 91
    // registered plans is a scale bug. BroadcastNestedLoopJoin is legal
    // ONLY for the documented broadcast-small-side designs (knn query
    // sides, IVF centroid assignment, pagerank's 1-row dangling mass,
    // capped truth baselines). Streaming queries are skipped — building
    // them drains a stream; their state-shape claims live in
    // StreamingQueries' own oracle rows.
    val bnljAllowed = Set(
      "q_embed_knn", "q_embed_ivf_knn", "q_embed_lsh_knn",
      "q_embed_dup_pairs", "q_embed_dup_clusters",
      "q_pagerank", "q_pagerank_golden", "q_join_multi",
      "q_tfidf",  // 1-row corpus-size aggregate broadcast into the scorer
      "q_kmeans") // k-row centroid table broadcast into assignment
    val offenders = Registry.byName.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream"))
      .flatMap { name =>
        val p = Registry.byName(name).run(spark, sf0001)
          .queryExecution.executedPlan.toString
        val cart = p.contains("CartesianProduct")
        val bnlj = p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name)
        if (cart) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("document chunking is a zero-shuffle generator projection") {
    val docs = Tables.documents(spark, sf0001)
    val p = graft.llm.Chunking.chunkDocs(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), s"expected a generator plan:\n$p")
  }

  test("a pagerank round computes its shuffle once (exchange reuse)") {
    // the contrib branch and the dangling-mass branch of pagerankStep both
    // sit above the same groupBy(dst) Exchange; if exchange reuse breaks,
    // every round pays the ranks-join-edges shuffle twice
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val vertices = Seq(1L, 2L, 3L, 4L, 5L).toDF("v") // 5 is dangling
    val ranks = vertices.withColumn("rank", lit(0.2))
    val w = edges.withColumn("w", lit(1.0))
    val df = graft.graph.Iterative.pagerankStep(ranks, w, vertices, 5.0, 0.85)
    df.collect() // AQE defers exchange reuse to runtime — check the FINAL plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"dangling-mass branch must reuse the contrib shuffle:\n$p")
  }

  test("whole-stage codegen covers the signature projections") {
    // regression guard for the CodegenFallback trap: a higher-order
    // filter() in these projections silently drops the stage out of
    // whole-stage codegen (ArrayFilter doesn't codegen)
    val docs = Tables.documents(spark, sf0001)
    Seq(
      graft.llm.Dedup.simHash(docs, "text", "doc_id"),
      graft.llm.Dedup.minHashSignatures(docs, "text", "doc_id")).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      // codegen'd operators render with a "*(stageId)" prefix
      assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
        s"expected the projection inside a whole-stage codegen span:\n$p")
    }
  }
}
