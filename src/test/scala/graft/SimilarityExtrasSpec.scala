package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Similarity}

/** Semantic properties of the round-11 embedding/dedup additions —
  * equivalences and containments the oracles can't express. */
class SimilarityExtrasSpec extends AnyFunSuite {
  import TestSession._

  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("mrlKnn at full dimension with a corpus-wide shortlist IS bruteForceKnn") {
    // truncDim = dim makes the cheap stage the exact scoring, and a
    // shortlist deeper than the corpus disables the cut — the ladder
    // must then reproduce the exact KNN row for row, proving the
    // refine plumbing adds no semantics of its own.
    val n = emb.count().toInt
    val exact = Similarity.bruteForceKnn(emb, "vec_id", "embedding",
      col("vec_id") < 5, k = 5).collect().map(_.toSeq).toSet
    val ladder = Similarity.mrlKnn(emb, "vec_id", "embedding",
      col("vec_id") < 5, truncDim = 64, shortlistK = n, k = 5)
      .collect().map(_.toSeq).toSet
    assert(ladder == exact)
  }

  test("int8Knn with a corpus-wide shortlist IS bruteForceKnn") {
    // a shortlist deeper than the corpus disables the code-space cut,
    // and the exact re-rank then scores every candidate with full
    // floats — the SQ8 ladder must reproduce exact KNN row for row,
    // proving the quantized stage only ever prunes, never rescores.
    val n = emb.count().toInt
    val exact = Similarity.bruteForceKnn(emb, "vec_id", "embedding",
      col("vec_id") < 5, k = 5).collect().map(_.toSeq).toSet
    val sq8 = Similarity.int8Knn(emb, "vec_id", "embedding",
      col("vec_id") < 5, shortlistK = n, k = 5)
      .collect().map(_.toSeq).toSet
    assert(sq8 == exact)
  }

  test("shuffle-joined fine-centroid delivery equals the broadcast path") {
    // maxBroadcastCentroids = 0 forces the no-hint delivery (the path
    // taken when cells ∝ corpus outgrow sane broadcasting): routing is
    // a join-STRATEGY change only, so mutual-kNN edges and routed
    // kmeans assignments must be row-for-row identical.
    val bcast = Similarity.mutualKnn(emb, "vec_id", "embedding", k = 5,
      routeAbove = 0).collect().map(_.toSeq).toSet
    val shuffled = Similarity.mutualKnn(emb, "vec_id", "embedding", k = 5,
      routeAbove = 0, maxBroadcastCentroids = 0)
      .collect().map(_.toSeq).toSet
    assert(bcast == shuffled && bcast.nonEmpty)
    val kb = Similarity.kmeansRouted(emb, "vec_id", "embedding", dim = 64,
      k = 8, iters = 2, coarse = 3).collect().map(_.toSeq).toSet
    val ks = Similarity.kmeansRouted(emb, "vec_id", "embedding", dim = 64,
      k = 8, iters = 2, coarse = 3, maxBroadcastCentroids = 0)
      .collect().map(_.toSeq).toSet
    assert(kb == ks && kb.nonEmpty)
  }

  test("mutualKnn edges are symmetric-by-construction and within-cell top-k") {
    val edges = Similarity.mutualKnn(emb, "vec_id", "embedding", k = 5,
      minCentroids = 4).collect()
    assert(edges.nonEmpty)
    // canonical orientation, no self-loops, no duplicates
    val pairs = edges.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("int8 quantization: mse bounded by the quantization step, checksum stable") {
    val out = Similarity.quantizeInt8(emb, "vec_id", "embedding").collect()
    assert(out.length == emb.count())
    out.foreach { r =>
      val scale = r.getDouble(1); val mse = r.getDouble(3)
      // worst-case per-component error is scale/2 inside the clamp range
      // (amax maps to ±127 exactly, so nothing clamps on real data)
      assert(mse <= scale * scale / 4 + 1e-12,
        s"mse $mse exceeds (scale/2)^2 for scale $scale")
    }
    // deterministic: a second run yields identical rows
    val again = Similarity.quantizeInt8(emb, "vec_id", "embedding").collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("domain classifier: head 0 is the binary scorer; argmax dominates every head") {
    import graft.llm.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    // head 0's weight formula ((0·64 + h)·mixer) IS mixerWeights(64), so
    // the classifier's head-0 score must equal hashedLinearScore's — and
    // the reported argmax score must dominate it for every document
    val head0 = TextAnalysis.hashedLinearScore(docs, "text", "doc_id",
      TextAnalysis.mixerWeights(64))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val out = TextAnalysis.domainClassify(docs, "text", "doc_id").collect()
    assert(out.length == head0.size)
    out.foreach { r =>
      val (id, dom, score) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      assert(score >= head0(id) - 1e-9,
        s"doc $id: argmax $score below head-0 ${head0(id)}")
      if (dom == 0L) assert(math.abs(score - head0(id)) < 1e-9)
    }
    assert(out.map(_.getLong(2)).distinct.length > 1,
      "fixture should spread across domains")
  }

  test("edit-distance pairs are a subset of the Jaccard pairs they verify") {
    val docs = Tables.documents(spark, sf0001)
    val jac = Dedup.minHashLshPairsExact(docs, "text", "doc_id",
      k = 3, numHashes = 64, bands = 16, tau = 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ed = Dedup.editDistancePairs(docs, "text", "doc_id",
      tauJ = 0.8, maxRel = 0.3).collect()
    assert(ed.nonEmpty, "fixture should contain verifiable near-dups")
    ed.foreach { r =>
      assert(jac.contains((r.getLong(0), r.getLong(1))))
      assert(r.getDouble(4) <= 0.3) // rel_edit respects the threshold
    }
    // the guard refuses the low-recall banding regime
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(docs, "text", "doc_id", tauJ = 0.5)
    }
  }
}
