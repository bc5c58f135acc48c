package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 curation additions: DSIR importance weights, SemDeDup-style
  * semantic dedup, and the phrase-blocklist audit. The registry oracles
  * prove engine parity; these specs pin the operator SEMANTICS on
  * hand-checkable fixtures. */
class CurationSpec extends AnyFunSuite {
  import TestSession._

  test("dsirWeights ranks target-looking docs above out-of-target docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", "en"),
      (2L, "alpha beta alpha beta gamma", "xx"),   // mostly target-like
      (3L, "zeta eta zeta eta zeta", "xx"),        // nothing like target
      (4L, "solo", "xx")                            // < 2 tokens
    ).toDF("doc_id", "text", "lang")
    val w = graft.llm.TextAnalysis
      .dsirWeights(docs, col("lang") === "en", "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w(4) == (0L, 0.0), "degenerate doc carries zero weight")
    assert(w(2)._2 > w(3)._2,
      s"target-like doc must outscore word salad: ${w(2)} vs ${w(3)}")
    assert(w(1)._2 > w(3)._2, "the target doc itself must outscore salad")
  }

  test("semanticDedup drops the later id of a within-cluster near-dup pair") {
    val s = spark
    import s.implicits._
    // two identical vectors + one orthogonal; k=1 puts all in one cluster
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.llm.Similarity
      .semanticDedup(emb, "vec_id", "embedding", dim = 4, k = 1, iters = 1,
        tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true),
      s"keep-first must drop exactly the later duplicate id: $out")
  }

  test("kmeansRouted with a single coarse cell IS flat kmeans") {
    val s = spark
    import s.implicits._
    // coarse = 1: every point routes to the one cell, which owns every
    // fine centroid, so the in-cell argmin is the global argmin — the
    // routed path must reproduce the flat assignment exactly
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(4)(j => ((i * 31 + j * 17) % 13).toFloat))
    }.toDF("vec_id", "embedding")
    val flat = graft.llm.Similarity
      .kmeans(emb, "vec_id", "embedding", dim = 4, k = 5, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val routed = graft.llm.Similarity
      .kmeansRouted(emb, "vec_id", "embedding", dim = 4, k = 5, iters = 2,
        coarse = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(routed === flat)
  }

  test("semanticDedup routed and flat agree on a well-separated fixture") {
    val s = spark
    import s.implicits._
    // two tight, far-apart groups: routing cannot flip any assignment
    // that matters, so kept/cluster structure must agree across paths
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.01f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    def kept(routeAbove: Int) = graft.llm.Similarity
      .semanticDedup(emb, "vec_id", "embedding", dim = 4, k = 2, iters = 2,
        tau = 0.9, routeAbove = routeAbove)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val flat = kept(routeAbove = 64)
    val routed = kept(routeAbove = 0)
    assert(flat === routed)
    assert(flat === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("hashedLinearScore is the mean bucket weight; empty docs score the bias") {
    val s = spark
    import s.implicits._
    // dim 1: every word hits bucket 0, so score = bias + weight
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = graft.llm.TextAnalysis
      .hashedLinearScore(docs, "text", "doc_id", Seq(0.25), bias = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1) == (3L, 0.75), s"mean of constant weights + bias: ${out(1)}")
    assert(out(2) == (0L, 0.5), "empty doc scores the bias")
    assert(out(3) == (0L, 0.5), "whitespace-only doc scores the bias")
  }

  test("blocklistHits matches whole-token phrases only, never substrings") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the class is big"),           // 'ass' must NOT hit inside 'class'
      (2L, "a big table stands"),         // 2-word phrase hit
      (3L, "big tables everywhere"),      // 'big tables' != 'big table'
      (4L, "ass big table ass")           // 1-word twice + phrase once
    ).toDF("doc_id", "text")
    val out = graft.llm.Scrub
      .blocklistHits(docs, "text", "doc_id", Seq("ass", "big table"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getBoolean(3)))
      .toMap
    assert(out(1) == (0L, "", true), s"substring must not match: ${out(1)}")
    assert(out(2) == (1L, "big table", false))
    assert(out(3) == (0L, "", true), s"phrase must match exactly: ${out(3)}")
    assert(out(4) == (3L, "ass\nbig table", false), s"occurrences count: ${out(4)}")
  }

  test("blocklistGate (stateless projection) equals blocklistHits row for row") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the class is big"),
      (2L, "a big table stands"),
      (3L, "big tables everywhere"),
      (4L, "ass big table ass"),
      (5L, ""),
      (6L, "big")
    ).toDF("doc_id", "text")
    val phrases = Seq("ass", "big table", "fast merge")
    val hits = graft.llm.Scrub.blocklistHits(docs, "text", "doc_id", phrases)
    val gate = graft.llm.Scrub.blocklistGate(docs, "text", "doc_id", phrases)
    // names + types must match (nullability may differ: expression-tree
    // columns are nullable where the audit's coalesce/count are not)
    assert(gate.schema.map(f => (f.name, f.dataType)) ==
      hits.schema.map(f => (f.name, f.dataType)),
      s"gate must keep the audit's contract: ${gate.schema} vs ${hits.schema}")
    val d = gate.exceptAll(hits).count() + hits.exceptAll(gate).count()
    assert(d == 0, s"projection and audit must agree row for row (diff=$d)")
    // and it must really be a projection: no exchange in the plan
    val p = gate.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"the gate must not shuffle:\n$p")
  }

  test("semanticIncremental rejects fresh near-dups of the corpus only") {
    val s = spark
    import s.implicits._
    // corpus: two separated directions; fresh: a near-copy of corpus
    // vector 10 (reject), an orthogonal newcomer (admit), and a pair of
    // identical fresh vectors (BOTH admitted — cross-only: fresh never
    // compares against fresh)
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val fresh = Seq(
      (20L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
      (21L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (22L, Array(0.0f, 0.0f, 0.9f, 0.1f)),
      (23L, Array(0.0f, 0.0f, 0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val out = graft.llm.Similarity
      .semanticIncremental(fresh, corpus, "vec_id", "embedding", dim = 4,
        k = 2, iters = 1, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(20L -> false, 21L -> true, 22L -> true, 23L -> true),
      s"only the corpus near-copy may be rejected: $out")
  }
}
