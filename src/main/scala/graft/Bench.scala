package graft
import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR.
  *
  * Output contract (round-4 fix for three rounds of `"parsed": null`):
  * the driver's log-tail capture window is ~3 kB, and the full 110-query
  * line no longer fits it whole — so stdout gets ONE SHORT headline JSON
  * line (total + a fixed representative query subset, well under 1 kB,
  * printed LAST, after spark.stop(), so no shutdown logging follows it),
  * while the complete per-query map is written to bench_out.json in the
  * working directory for anything that wants the full detail.
  *
  * Timing discipline (round 6: multiple full suite passes — r3/r4/r5
  * each got adjudicated for phantom regressions because the box swings
  * whole-suite totals ±25 % across runs and the driver captures exactly
  * one; min-of-N within a pass bounds per-query spikes but not a
  * uniformly slow pass): the whole query loop runs `Passes` times (3
  * since r12) and each query reports the MIN across every sample of
  * every pass, so the recorded number measures the binary, not which
  * side of the box's coin flip the capture landed on. Within a pass,
  * scheduler/GC noise only ever ADDS time, so each query takes the min
  * of its 2 runs. Every raw sample is preserved in bench_out.json under
  * "samples" (per query, ordered by pass) so cross-round variance
  * attribution can be done from the artifacts instead of by hand. Each timed run releases its terminal checkpoint
  * blocks afterwards — in a `finally`, so a failing query can't leak its
  * partially-built checkpoints into the remaining rows' GC pressure
  * (graft.core.Checkpoints). A run that throws records NO sample; a query
  * with no successful sample reports null rather than a plausible-looking
  * wall-clock number. Names are sorted so per-query diffs line up run to
  * run.
  */
object Bench {

  /** Number of full suite passes; per-query result is min across passes.
    * 3 since round 12 (r11 VERDICT #5): the 2-pass min was still
    * absorbing whole-pass interference — pass-2 outliers like a 12.2 s
    * q_pagerank_golden sample and q_semantic_incremental's 1.48×
    * round-over-round drift (probed: unchanged code + unchanged fixture,
    * min-of-10 back-to-back warm samples can no longer reproduce the
    * old number → environment drift, not the binary). A third pass
    * gives every query one more independent shot at a quiet window; to
    * hold the wall budget, cheap queries now run min-of-2 WITHIN a pass
    * (was 3) — the same 6 total samples as r11's 2×3, redistributed
    * into three independent windows instead of two. */
  val Passes = 3

  /** Fixed stdout subset: the headline operators the round-over-round
    * comparison tracks — dedup suite, ANN suite, iterative graph, text,
    * streaming, relational representatives. */
  val headline: Seq[String] = Seq(
    "q1_agg", "q_asof_join", "q_cc_labels", "q_cc_labels_star",
    "q_chunk_docs", "q_pack_sequences", "q_sessionize",
    "q_corpus_stats", "q_dedup_clusters", "q_dedup_exact",
    "q_dedup_normalized", "q_embed_ivf_knn", "q_embed_knn",
    "q_embed_lsh_knn", "q_join_multi", "q_luby_mis", "q_minhash_lsh_pairs",
    "q_ngram_jaccard_pairs", "q_pagerank", "q_simhash_pairs",
    "q_simhash_pairs_wide", "q_sort_global", "q_sssp", "q_sssp_multi",
    "q_stream_hourly", "q_token_stats", "q_triangle_count",
    "q_union_all_count", "q_window_rank", "q_wordfreq",
    // round-5 additions
    "q_wordfreq_salted", "q_repetition", "q_mixture_temperature",
    "q_decode_features", "q_incremental_dedup", "q_dedup_survivors",
    // round-6 additions
    "q_repeated_spans", "q_excise_spans", "q_pii_scrub",
    "q_decode_audio_features", "q_embed_pq_knn", "q_embed_ivfpq_knn",
    "q_lm_score", "q_approx_distinct_kmv", "q_contamination_score",
    "q_stratified_sample", "q_embed_ivfpq_res_knn", "q_cms_heavy_hitters",
    "q_shard_assign", "q_vocab_encode", "q_relative_quality",
    "q_embed_decontaminate", "q_stream_cms", "q_profile_docs",
    "q_pseudonymize", "q_k_anonymity", "q_containment_pairs",
    "q_pmi_pairs", "q_bm25_topk",
    // round-9 additions
    "q_dsir_weights", "q_dsir_sample", "q_semantic_dedup", "q_blocklist",
    "q_linear_score", "q_curation_pipeline", "q_range_join",
    "q_interval_overlap", "q_anf_reach", "q_anf_profile",
    // round-10 additions
    "q_anf_centrality", "q_anf_diameter", "q_image_dedup", "q_audio_dedup",
    "q_semantic_dedup_routed", "q_stream_blocklist",
    // round-10 second tranche: events analytics, curation gates,
    // retrieval fusion, graph readouts
    "q_funnel", "q_retention", "q_gopher_rules", "q_novelty",
    "q_token_budget_mix", "q_hybrid_rrf", "q_clustering_coeff",
    "q_stream_funnel", "q_ppr", "q_event_anomaly", "q_event_transitions",
    "q_ktruss", "q_cluster_split", "q_dup_weights", "q_link_prediction",
    "q_semantic_incremental", "q_stream_transitions", "q_stream_anomaly",
    "q_corr_matrix", "q_matching",
    // round-11 additions: tuned ANN dials, ANN-backed retrieval, and the
    // production tol-mode rank entries
    "q_embed_ivf_knn_tuned", "q_embed_pq_refined_tuned", "q_hybrid_rrf_ann",
    "q_embed_ivf_knn_clustered", "q_embed_int8", "q_edit_dedup",
    "q_embed_mrl_knn", "q_embed_mutual_knn", "q_embed_mutual_knn_routed",
    "q_stream_embed_route", "q_stream_int8", "q_domain_classify", "q_l_diversity",
    "b_pagerank_tol", "b_ppr_tol",
    // round-12 additions: the persisted-index serve/build pair, the
    // SQ8 search paths, the LSH retrieval arm, the SQL surface
    "q_embed_ivf_knn_stored", "b_ivf_build", "q_hybrid_rrf_lsh",
    "q_embed_int8_knn", "q_embed_ivf_sq8_stored", "q_sql_simhash_pairs",
    "q_incremental_dedup_stored", "q_bm25_stored", "b_text_build",
    // round-13 additions: stored-index fusion, collapsed fuzzy
    // clusters, the maintenance windows (compact + refresh), the
    // routed-ingest stored twin
    "q_hybrid_rrf_stored", "q_edit_dedup_clusters", "b_ivf_compact",
    "b_ivf_refresh", "q_embed_ivf_knn_routed_stored",
    // round-14 additions: the persisted MEDIA fingerprint family, the
    // composed maintenance entry point, the media-index build window
    "q_image_dedup_stored", "q_audio_dedup_stored", "b_ivf_maintain",
    "b_media_build", "q_embed_ivf_knn_auto_stored", "b_ivf_reprobe")

  /** BENCH-ONLY entries (r10 VERDICT #5): the production CONVERGENCE
    * mode of the iterative rank ops. The registered q_pagerank/q_ppr run
    * 5 fixed unrolled rounds because the oracle replays a fixed chain;
    * production runs to Σ|Δrank| < tol — a result that depends on a
    * runtime convergence test, so it has no fixed-unroll oracle and
    * lives here (timed, recorded in BENCH/bench_out.json) rather than in
    * the Registry (whose zero rows-only discipline stays intact). */
  val benchOnly: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "b_pagerank_tol" -> ((s, d) => graft.graph.Iterative.pagerank(
      graft.graph.GraphOps.edgesFromLineitem(s, d),
      alpha = 0.85, tol = 1e-6, maxIter = 50)),
    // the composed multimodal admission with EVERY dial on — perceptual
    // video + audio-excerpt + image-crop legs over the registered
    // crawl batch: the production curation gate at full strength, SIX
    // gate plans over one checkpointed batch. q_crawl_admit oracles
    // the byte-exact regime; the dial semantics are pinned per leg by
    // CrawlAdmitSpec, so this row exists to TIME the composition.
    "b_crawl_admit_dials" -> ((s, d) =>
      graft.multimodal.CrawlAdmit.admitFlags(s,
        graft.multimodal.CrawlAdmit.crawlBatch(s, d),
        graft.sources.DedupIndex.ensureBuiltFull(s, d),
        graft.sources.MediaIndex.ensureBuiltImage(s, d),
        graft.sources.MediaIndex.ensureBuiltAudioCorpus(s, d),
        graft.sources.VideoIndex.ensureBuiltVideoCorpus(s, d),
        videoPerceptual = true,
        audioClipIdx =
          Some(graft.sources.VideoIndex.ensureBuiltAudioSegCorpus(s, d)),
        imageCropIdx =
          Some(graft.sources.VideoIndex.ensureBuiltImageRowsCorpus(s, d)))),
    "b_ppr_tol" -> ((s, d) => graft.graph.Iterative.personalizedPagerank(
      graft.graph.GraphOps.edgesFromLineitem(s, d), Seq(0L, 7L, 42L),
      alpha = 0.85, tol = 1e-6, maxIter = 50)),
    // the IVF index BUILD, forced fresh every run (no memo): the one-time
    // |corpus|·numCentroids assignment + bucketed write that
    // q_embed_ivf_knn_stored amortizes — its bench row is the
    // query-time ≪ assign-time evidence the stored layout exists for.
    // No fixed-unroll oracle applies (the artifact is a side effect),
    // so it lives here; the SERVED answer is oracle-checked by
    // q_embed_ivf_knn_stored.
    "b_ivf_build" -> ((s, d) => {
      graft.sources.IvfIndex.build(s, graft.Tables.embeddings(s, d),
        "vec_id", "embedding", "graft_ivf_benchbuild", numCentroids = 64)
      s.table("graft_ivf_benchbuild_cells")
    }),
    // the TEXT index BUILD, same contract as b_ivf_build: the one-time
    // tokenize+aggregate+bucketed-write pass that q_bm25_stored
    // amortizes (the live q_bm25_topk re-pays the tokenize part of it
    // on every run). Served answers are oracle-checked by q_bm25_stored.
    "b_text_build" -> ((s, d) => {
      graft.sources.TextIndex.build(s, graft.Tables.documents(s, d),
        "text", "doc_id", "graft_text_benchbuild")
      s.table("graft_text_benchbuild_postings")
    }),
    // the maintenance op (r12 VERDICT #2): rebuild-in-place of an
    // APPENDED index under its own bucket spec — build + 3 appends +
    // compact, timed together so the row bounds the whole maintenance
    // window. The artifact is a side effect (no oracle); answer
    // equivalence across the swap is pinned by CompactSpec.
    "b_ivf_compact" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = graft.Tables.embeddings(s, d)
      graft.sources.IvfIndex.build(s, emb.where(col("vec_id") % 4 === 0),
        "vec_id", "embedding", "graft_ivf_benchcmp", numCentroids = 64)
      (1L to 3L).foreach(r => graft.sources.IvfIndex.append(s,
        "graft_ivf_benchcmp", emb.where(col("vec_id") % 4 === r),
        "vec_id", "embedding"))
      graft.sources.IvfIndex.compact(s, "graft_ivf_benchcmp")
      s.table("graft_ivf_benchcmp_cells")
    }),
    // the OTHER maintenance op: quantizer refresh after a skew-heavy
    // append (build half + drifted-append half + Lloyd-refined rebuild
    // — the detect→decide→act lifecycle timed as one window)
    "b_ivf_refresh" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val emb = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      graft.sources.IvfIndex.build(s, emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", "graft_ivf_benchrf", numCentroids = 64)
      val drifted = emb.where(col("vec_id") % 2 === 1).select(
        (col("vec_id") + lit(10000000L)).as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (element_at(col("embedding"), ((i + lit(7)) % lit(dim)) + 1)
            + lit(2.0)).cast("float")).as("embedding"))
      graft.sources.IvfIndex.append(s, "graft_ivf_benchrf", drifted,
        "vec_id", "embedding")
      if (graft.sources.IvfIndex.needsRefresh(s, "graft_ivf_benchrf"))
        graft.sources.IvfIndex.refresh(s, "graft_ivf_benchrf")
      s.table("graft_ivf_benchrf_cells")
    }),
    // the COMPOSED maintenance pass (r13 VERDICT #3): one
    // IvfIndex.maintain call over a freshly built + drifted-appended
    // index — detect (occupancy skew) → decide → refresh+compact →
    // re-measure, the single scheduled entry a deployment runs.
    // Lifecycle equivalences are pinned by IvfLifecycleSpec.
    "b_ivf_maintain" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val emb = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      graft.sources.IvfIndex.build(s, emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", "graft_ivf_benchmnt", numCentroids = 64)
      val drifted = emb.where(col("vec_id") % 2 === 1).select(
        (col("vec_id") + lit(10000000L)).as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (element_at(col("embedding"), ((i + lit(7)) % lit(dim)) + 1)
            + lit(2.0)).cast("float")).as("embedding"))
      graft.sources.IvfIndex.append(s, "graft_ivf_benchmnt", drifted,
        "vec_id", "embedding")
      graft.sources.IvfIndex.maintain(s, "graft_ivf_benchmnt")
      s.table("graft_ivf_benchmnt_cells")
    }),
    // the MEDIA fingerprint index BUILD (r13 VERDICT #1): the one-time
    // decode+dHash pass over every payload — the exact cost the ×100
    // decomposition showed q_image_dedup re-paying per run, now paid
    // here once; q_image_dedup_stored's bench row is the amortized
    // query-time evidence. Served pairs are oracle-checked there.
    "b_media_build" -> ((s, d) => {
      graft.sources.MediaIndex.build(s,
        graft.multimodal.Multimodal.imageDHash(
          graft.multimodal.Multimodal.imageTable(s, d)),
        "graft_media_benchbuild")
      s.table("graft_media_benchbuild_fp")
    }),
    // the RE-PROBE window (the step R14AutoKProbe showed is mandatory
    // after any cell-dial change: recall dropped 1.000 → 0.900 when
    // cells grew 64 → 1415 at fixed nProbe): label-free recall
    // frontier from the index's own stored vectors + the dial pick —
    // the maintenance-window cost a deployment pays after a
    // refreshed=true maintain pass.
    "b_ivf_reprobe" -> ((s, d) => {
      import s.implicits._
      val name = graft.sources.IvfIndex.ensureBuilt(s, d)
      val frontier = graft.sources.IvfIndex.reprobeRecall(s, name,
        nProbes = Seq(4, 8, 16), numQueries = 32, k = 5)
      val picked = graft.sources.IvfIndex.pickNProbe(frontier, 0.95)
      frontier.map(p => (p.nProbe, p.recall, picked))
        .toDF("n_probe", "recall", "picked")
    }),
    // the banding-dial re-probe for the MEDIA family (the r14 verdict's
    // pickNProbe discipline for fingerprints): sampled brute-force
    // Hamming truth vs the banded gate, cumulative recall per maxDist,
    // and the dial pick — the maintenance-window cost a deployment pays
    // after a compaction/drift pass before trusting maxDist.
    "b_media_reprobe" -> ((s, d) => {
      import s.implicits._
      val name = graft.sources.MediaIndex.ensureBuiltAudio(s, d)
      val frontier = graft.sources.MediaIndex.reprobeRecall(s, name,
        maxDists = Seq(3, 4, 5, 6), sampleSize = 128)
      val picked = graft.sources.MediaIndex.pickMaxDist(frontier, 0.95)
      frontier.map(p => (p.maxDist, p.recall, p.truthPairs, picked))
        .toDF("max_dist", "recall", "truth_pairs", "picked")
    }),
    // ONE scheduled maintenance window across families (r14 stretch
    // #8): a drift-appended vector index + a fragment-appended video
    // index walked by a single Maintenance.maintainAll call — census,
    // decide, refresh-or-compact, stop re-derivation, one report.
    "b_maintain_all" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val emb = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      graft.sources.IvfIndex.build(s, emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", "graft_mntall_ivf", numCentroids = 64)
      graft.sources.IvfIndex.append(s, "graft_mntall_ivf",
        emb.where(col("vec_id") % 2 === 1), "vec_id", "embedding")
      val docs = graft.Tables.documents(s, d)
      graft.sources.VideoIndex.build(s,
        graft.multimodal.Multimodal.videoFramesFp(
          graft.multimodal.Multimodal.videoTableOf(
            docs.where(col("doc_id") % 4 === 0))), "graft_mntall_vid")
      (1 to 3).foreach(i => graft.sources.VideoIndex.append(s,
        "graft_mntall_vid",
        graft.multimodal.Multimodal.videoFramesFp(
          graft.multimodal.Multimodal.videoTableOf(
            docs.where(col("doc_id") % 4 === 1)
              .select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
                col("text"))))))
      val rep = graft.sources.Maintenance.maintainAll(s,
        Seq(("ivf", "graft_mntall_ivf"), ("video", "graft_mntall_vid")))
      rep.map(r => (r.kind, r.name, r.refreshed,
          r.compacted.values.map(_._1).sum,
          r.compacted.values.map(_._2).sum))
        .toDF("kind", "name", "refreshed", "files_before", "files_after")
    }))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing: file listing, parquet footers, and
    // first-codegen costs land here instead of on whichever query runs first.
    Seq("lineitem", "orders", "documents", "embeddings", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // one toy iterative run warms the join/agg/checkpoint codegen shapes
    // that the alphabetically-first iterative query would otherwise pay for
    try {
      import spark.implicits._
      graft.graph.Iterative.ccFind(
        Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")).count()
    } catch { case _: Throwable => () }

    /** One timed run; None if the query threw. The frame is bound outside
      * the try so its checkpoints are released even on failure. */
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      var df: org.apache.spark.sql.DataFrame = null
      try {
        val t0 = System.nanoTime()
        df = fn(spark, sfDir)
        df.count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case _: Throwable => None
      } finally {
        if (df != null) {
          try graft.core.Checkpoints.release(df)
          catch { case _: Throwable => () }
        }
      }
    }

    val names = (SparkEntry.queries ++ benchOnly).toSeq.sortBy(_._1)
    // samples(name) accumulates every raw run time, pass 1 first.
    val samples = scala.collection.mutable.LinkedHashMap(
      names.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    for (_ <- 1 to Passes) {
      names.foreach { case (name, fn) =>
        val first = timeOnce(fn)
        val extra = first match {
          case Some(_) => Seq(timeOnce(fn)) // min of 2 per pass
          case None => Seq.empty // query is broken; don't burn wall re-proving it
        }
        samples(name) = samples(name) ++ (first.toSeq ++ extra.flatten)
      }
    }
    val results: Seq[(String, Option[Double])] =
      names.map { case (name, _) =>
        val s = samples(name)
        name -> (if (s.isEmpty) None else Some(s.min))
      }
    spark.stop()

    def f(v: Double): String = "%.3f".formatLocal(Locale.ROOT, v)
    def fOpt(v: Option[Double]): String = v.map(f).getOrElse("null")
    // A query that throws on every run reports null and drops OUT of the
    // headline total — which would read as a round-over-round speedup. The
    // explicit failure count/list makes total comparisons self-invalidate
    // when the contributing query sets differ.
    val failed = results.collect { case (n, None) => n }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    def jsonLine(qs: Seq[(String, Option[Double])], total: Double, detail: Boolean): String = {
      val m = qs.map { case (k, v) => "\"" + k + "\":" + fOpt(v) }
        .mkString("{", ",", "}")
      val raw =
        if (!detail) ""
        else samples.map { case (k, s) =>
          "\"" + k + "\":" + s.map(f).mkString("[", ",", "]")
        }.mkString(""","samples":{""", ",", "}")
      s"""{"metric":"total","value":${f(total)},"unit":"sec",""" +
        s""""queries":$m,"sf":"$sfDir","n_queries":${results.size},""" +
        s""""n_failed":${failed.size},"failed":$failedJson,""" +
        s""""passes":$Passes,"detail":"bench_out.json"$raw}"""
    }
    val total = results.flatMap(_._2).sum
    try {
      val w = new java.io.PrintWriter("bench_out.json")
      try w.println(jsonLine(results, total, detail = true)) finally w.close()
    } catch { case _: Throwable => () }
    val headSet = headline.toSet
    println(jsonLine(results.filter(r => headSet(r._1)), total, detail = false))
  }
}
