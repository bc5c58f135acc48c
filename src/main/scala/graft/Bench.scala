package graft
import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR.
  *
  * ==Round-16 rewrite: fit the driver's window, keep the signal==
  *
  * BENCH_r15 died at rc=124 (raw query-loop wall ~3,558 s against a
  * ~1,200 s driver budget) and — separately — every round since r12 had
  * `parsed:null` even at rc=0 because the driver keeps only the LAST
  * ~2,000 chars of stdout and the one-line headline JSON had grown past
  * it (its `{"metric":...` start fell outside the window; verified
  * against BENCH_r12..r15 artifacts, vs r05/r08 which parsed fine with a
  * small query map). Both failure modes are fixed here:
  *
  *  1. '''Untimed warmup phase''': every shared stored-index fixture
  *     (`ensureBuilt*` memos) and every bench-window setup is built
  *     BEFORE the timed loop, so first samples no longer pay fixture
  *     construction (r15: pass-1 wall 2,077 s vs warm-pass 508 s).
  *  2. '''Hoisted b_* setups''': maintenance windows time ONLY the
  *     maintenance call (r15 verdict "What's wrong #2": b_maintain_all's
  *     timed run rebuilt an IVF index + decoded the video corpus before
  *     the `maintainAll` it exists to time).
  *  3. '''Confirm runs go to the expensive tail FIRST''' (r16 verdict
  *     finding #1: 197/256 driver-capture entries were single COLD
  *     samples and the top rows carried up to 28× measurement error —
  *     q_image_crop_perceptual recorded 237.7 s vs its 8.4 s warm
  *     floor — because pass-2 budget was spent FIFO on cheap entries).
  *     Pass 1 is mandatory-first-runs only; every later pass re-sorts
  *     the entries by DESCENDING current min, so the rows where a cold
  *     first sample hides the most error confirm before any cheap
  *     entry burns budget. b_* windows run once total. Passes default
  *     2 (env SPARK_GRAFT_BENCH_PASSES).
  *  4. '''Budget guard''' (never silent): cumulative SAMPLE wall —
  *     including the wall of FAILED attempts (r16 ADVICE: a query that
  *     runs long and then throws still burned the driver window) — is
  *     tracked against SPARK_GRAFT_BENCH_BUDGET_SEC (default 800).
  *     Over budget, every entry still gets its mandatory first run but
  *     all extra runs are skipped and the affected names are recorded
  *     in bench_out.json `curtailed` + counted in the headline.
  *  5. '''Incremental checkpoint + shutdown headline''': bench_out.json
  *     is rewritten after every completed entry, and a JVM shutdown
  *     hook prints the (partial:true) headline if the driver's timeout
  *     kills the process — a future overrun degrades to a partial
  *     signal instead of null.
  *  6. '''Compact headline''': stdout gets ONE short JSON line, printed
  *     last, with a fixed ~55-query representative map, hard-capped
  *     under 1,900 chars (queries are dropped from the end of the list
  *     — and counted in `hl_dropped` — sooner than overflowing the
  *     driver's tail window). The full per-entry map + every raw sample
  *     lives in bench_out.json.
  *
  * Timing discipline: within a pass, scheduler/GC noise only ever ADDS
  * time, so each entry reports the MIN across every sample of every
  * pass; every raw sample is preserved in bench_out.json under
  * "samples" (ordered by pass) so cross-round variance attribution can
  * be done from artifacts. Each timed run releases its terminal
  * checkpoint blocks in a `finally` (graft.core.Checkpoints), so a
  * failing query can't leak partially-built checkpoints into the
  * remaining rows' GC pressure. A run that throws records NO sample; an
  * entry with no successful sample reports null rather than a
  * plausible-looking number, and drops OUT of the headline total — the
  * explicit failure list makes total comparisons self-invalidate when
  * the contributing sets differ.
  */
object Bench {

  /** Full suite passes (min across passes bounds whole-pass interference;
    * the r11 finding). 2 by default since r16 — the third pass's extra
    * confirmation no longer fits the driver window alongside 246+
    * entries; the budget guard (not the pass count) is the enforcement. */
  def passes: Int =
    sys.env.get("SPARK_GRAFT_BENCH_PASSES").flatMap(_.toIntOption).getOrElse(2)

  /** Budget on the cumulative SAMPLE wall (seconds). Mandatory first runs
    * ignore it; every extra run checks it. Sized from the measured sf0.1
    * driver-shape run (warmup 90 s, pass-1 mandatory wall ~500 s, sbt
    * ~60 s against the ~1,200 s window): 800 leaves pass 2 room for the
    * confirm runs that tighten mins (at 600 the guard curtailed 188/251
    * entries to single noisy samples) while still capping a slower box —
    * the budget bounds sample wall regardless of box speed, and even a
    * 1.5× slower box's mandatory-first-run wall (~540 s) fits. */
  def budgetSec: Double =
    sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC").flatMap(_.toDoubleOption).getOrElse(800.0)

  /** Fixed stdout subset: representatives of every family the
    * round-over-round comparison tracks, sized to keep the headline line
    * inside the driver's ~2 kB stdout tail (the r12–r15 parsed:null
    * cause). Order matters: later names are dropped first if the line
    * would overflow, so put the longest-tracked representatives first. */
  val headline: Seq[String] = Seq(
    // core relational + text + graph (tracked since r1-r5)
    "q1_agg", "q_join_multi", "q_window_rank", "q_sort_global",
    "q_union_all_count", "q_wordfreq", "q_token_stats", "q_sessionize",
    "q_cc_labels", "q_sssp", "q_triangle_count", "q_pagerank", "q_luby_mis",
    // dedup suite
    "q_dedup_exact", "q_dedup_normalized", "q_minhash_lsh_pairs",
    "q_simhash_pairs", "q_dedup_clusters", "q_incremental_dedup_stored",
    // ANN / retrieval
    "q_embed_knn", "q_embed_ivf_knn", "q_embed_ivf_knn_stored",
    "q_embed_pq_knn", "q_embed_ivfpq_knn", "q_embed_lsh_knn",
    "q_hybrid_rrf_stored", "q_bm25_stored", "q_semantic_dedup",
    // curation / streaming / events
    "q_gopher_rules", "q_curation_pipeline", "q_stream_hourly",
    "q_stream_cms", "q_funnel", "q_retention", "q_vocab_encode",
    // multimodal + stored media/video families
    "q_image_dedup", "q_audio_dedup", "q_video_dedup",
    "q_image_dedup_stored", "q_audio_dedup_stored", "q_video_dedup_stored",
    "q_video_clip_detect", "q_video_dedup_perceptual",
    "q_video_clip_perceptual", "q_audio_clip_detect",
    "q_audio_clip_perceptual", "q_image_crop_detect", "q_crawl_admit",
    // round-16 additions
    "q_image_crop2d_detect", "q_video_keyframe_dedup",
    // maintenance / build windows
    "b_ivf_build", "b_ivf_compact", "b_ivf_maintain", "b_maintain_all",
    "b_crawl_admit_dials", "b_pagerank_tol", "b_media_build")

  /** A bench-only entry: `setup` runs ONCE, untimed, in the warmup phase;
    * `run` is the timed window. b_* windows are sampled once total. */
  final case class BEntry(
      setup: Option[(SparkSession, String) => Unit],
      run: (SparkSession, String) => DataFrame)

  /** BENCH-ONLY entries (r10 VERDICT #5): production modes with no
    * fixed-unroll oracle — convergence-mode iterative ranks, index
    * builds (artifact = side effect; served answers oracle-checked by
    * their q_*_stored twins), and maintenance windows (answer
    * equivalence across the swap pinned by CompactSpec /
    * IvfLifecycleSpec). Setup work (fixture builds, appends, drift
    * synthesis) is hoisted into `setup` so the timed closure measures
    * only the operation the row is named for. */
  val benchOnly: Map[String, BEntry] = Map(
    "b_pagerank_tol" -> BEntry(None, (s, d) => graft.graph.Iterative.pagerank(
      graft.graph.GraphOps.edgesFromLineitem(s, d),
      alpha = 0.85, tol = 1e-6, maxIter = 50)),
    "b_ppr_tol" -> BEntry(None, (s, d) => graft.graph.Iterative.personalizedPagerank(
      graft.graph.GraphOps.edgesFromLineitem(s, d), Seq(0L, 7L, 42L),
      alpha = 0.85, tol = 1e-6, maxIter = 50)),
    // the composed multimodal admission with EVERY dial on — the
    // production curation gate at full strength, SIX gate plans over one
    // checkpointed batch. q_crawl_admit oracles the byte-exact regime;
    // dial semantics are pinned per leg by CrawlAdmitSpec; this row
    // exists to TIME the composition. Fixture indexes come from the
    // ensureBuilt memos (warmed in setup; the timed calls are memo hits).
    "b_crawl_admit_dials" -> BEntry(
      Some((s, d) => {
        graft.sources.DedupIndex.ensureBuiltFull(s, d)
        graft.sources.MediaIndex.ensureBuiltImage(s, d)
        graft.sources.MediaIndex.ensureBuiltAudioCorpus(s, d)
        graft.sources.VideoIndex.ensureBuiltVideoCorpus(s, d)
        graft.sources.VideoIndex.ensureBuiltAudioSegCorpus(s, d)
        graft.sources.VideoIndex.ensureBuiltImageRowsCorpus(s, d)
        graft.sources.VideoIndex.ensureBuiltImageBlocksCorpus(s, d)
        graft.sources.VideoIndex.ensureBuiltVideoKeyframesCorpus(s, d)
        ()
      }),
      (s, d) => graft.multimodal.CrawlAdmit.admitFlags(s,
        graft.multimodal.CrawlAdmit.crawlBatch(s, d),
        graft.sources.DedupIndex.ensureBuiltFull(s, d),
        graft.sources.MediaIndex.ensureBuiltImage(s, d),
        graft.sources.MediaIndex.ensureBuiltAudioCorpus(s, d),
        graft.sources.VideoIndex.ensureBuiltVideoCorpus(s, d),
        videoPerceptual = true,
        audioClipIdx =
          Some(graft.sources.VideoIndex.ensureBuiltAudioSegCorpus(s, d)),
        imageCropIdx =
          Some(graft.sources.VideoIndex.ensureBuiltImageRowsCorpus(s, d)),
        // the r15 gates' semantics, now explicit opt-ins (r16: the
        // toggles default to the byte-exact clip gates)
        audioClipPerceptual = true, imageCropPerceptual = true,
        imageCrop2dIdx =
          Some(graft.sources.VideoIndex.ensureBuiltImageBlocksCorpus(s, d)),
        // r17: the real-codec keyframe leg — containers parsed once per
        // batch, decoded digests gated byte-exactly (EIGHT gate legs)
        videoKeyframeIdx =
          Some(graft.sources.VideoIndex.ensureBuiltVideoKeyframesCorpus(s, d)))),
    // index BUILDS, forced fresh in the timed run (the build IS the
    // operation): the one-time assignment/tokenize/decode cost the
    // q_*_stored twins amortize.
    "b_ivf_build" -> BEntry(None, (s, d) => {
      graft.sources.IvfIndex.build(s, graft.Tables.embeddings(s, d),
        "vec_id", "embedding", "graft_ivf_benchbuild", numCentroids = 64)
      s.table("graft_ivf_benchbuild_cells")
    }),
    "b_text_build" -> BEntry(None, (s, d) => {
      graft.sources.TextIndex.build(s, graft.Tables.documents(s, d),
        "text", "doc_id", "graft_text_benchbuild")
      s.table("graft_text_benchbuild_postings")
    }),
    "b_media_build" -> BEntry(None, (s, d) => {
      graft.sources.MediaIndex.build(s,
        graft.multimodal.Multimodal.imageDHash(
          graft.multimodal.Multimodal.imageTable(s, d)),
        "graft_media_benchbuild")
      s.table("graft_media_benchbuild_fp")
    }),
    // the KEYFRAME index BUILD: the one-time container parse +
    // javax.imageio decode + digest pass over every video — the exact
    // cost q_video_keyframe_dedup re-pays live per run and its _stored
    // twin amortizes. Served answers oracle-checked there.
    "b_videokf_build" -> BEntry(None, (s, d) => {
      graft.sources.VideoIndex.build(s,
        graft.multimodal.Multimodal.videoKeyframesFp(
          graft.multimodal.Multimodal.videoKeyframeTable(s, d)),
        "graft_videokf_benchbuild")
      s.table("graft_videokf_benchbuild_vf")
    }),
    // maintenance windows: setup builds the appended/drifted fixture,
    // the timed run is ONLY the maintenance call.
    "b_ivf_compact" -> BEntry(
      Some((s, d) => {
        import org.apache.spark.sql.functions.col
        val emb = graft.Tables.embeddings(s, d)
        graft.sources.IvfIndex.build(s, emb.where(col("vec_id") % 4 === 0),
          "vec_id", "embedding", "graft_ivf_benchcmp", numCentroids = 64)
        (1L to 3L).foreach(r => graft.sources.IvfIndex.append(s,
          "graft_ivf_benchcmp", emb.where(col("vec_id") % 4 === r),
          "vec_id", "embedding"))
      }),
      (s, _) => {
        graft.sources.IvfIndex.compact(s, "graft_ivf_benchcmp")
        s.table("graft_ivf_benchcmp_cells")
      }),
    "b_ivf_refresh" -> BEntry(
      Some((s, d) => {
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
      }),
      (s, _) => {
        if (graft.sources.IvfIndex.needsRefresh(s, "graft_ivf_benchrf"))
          graft.sources.IvfIndex.refresh(s, "graft_ivf_benchrf")
        s.table("graft_ivf_benchrf_cells")
      }),
    "b_ivf_maintain" -> BEntry(
      Some((s, d) => {
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
      }),
      (s, _) => {
        graft.sources.IvfIndex.maintain(s, "graft_ivf_benchmnt")
        s.table("graft_ivf_benchmnt_cells")
      }),
    // re-probe windows: the dial re-measurement a deployment pays after
    // a maintenance pass before trusting nProbe / maxDist.
    "b_ivf_reprobe" -> BEntry(
      Some((s, d) => { graft.sources.IvfIndex.ensureBuilt(s, d); () }),
      (s, d) => {
        import s.implicits._
        val name = graft.sources.IvfIndex.ensureBuilt(s, d)
        val frontier = graft.sources.IvfIndex.reprobeRecall(s, name,
          nProbes = Seq(4, 8, 16), numQueries = 32, k = 5)
        val picked = graft.sources.IvfIndex.pickNProbe(frontier, 0.95)
        frontier.map(p => (p.nProbe, p.recall, picked))
          .toDF("n_probe", "recall", "picked")
      }),
    "b_media_reprobe" -> BEntry(
      Some((s, d) => { graft.sources.MediaIndex.ensureBuiltAudio(s, d); () }),
      (s, d) => {
        import s.implicits._
        val name = graft.sources.MediaIndex.ensureBuiltAudio(s, d)
        val frontier = graft.sources.MediaIndex.reprobeRecall(s, name,
          maxDists = Seq(3, 4, 5, 6), sampleSize = 128)
        val picked = graft.sources.MediaIndex.pickMaxDist(frontier, 0.95)
        frontier.map(p => (p.maxDist, p.recall, p.truthPairs, picked))
          .toDF("max_dist", "recall", "truth_pairs", "picked")
      }),
    // ONE scheduled maintenance window across families: census, decide,
    // refresh-or-compact, stop re-derivation, one report. Setup builds
    // the drift-appended vector index + fragment-appended video index;
    // the timed run is the single maintainAll call a deployment schedules.
    "b_maintain_all" -> BEntry(
      Some((s, d) => {
        import org.apache.spark.sql.functions._
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
      }),
      (s, _) => {
        import s.implicits._
        val rep = graft.sources.Maintenance.maintainAll(s,
          Seq(("ivf", "graft_mntall_ivf"), ("video", "graft_mntall_vid")))
        rep.map(r => (r.kind, r.name, r.refreshed,
            r.compacted.values.map(_._1).sum,
            r.compacted.values.map(_._2).sum))
          .toDF("kind", "name", "refreshed", "files_before", "files_after")
      }))

  /** Shared stored-index fixtures the REGISTERED queries serve from
    * (each ensureBuilt* memoizes; building here moves the cost out of
    * first samples into the untimed warmup). Failures are per-fixture
    * non-fatal: a broken fixture surfaces in its queries' samples. */
  def warmFixtures(s: SparkSession, d: String): Unit = {
    val fixtures: Seq[(String, () => Any)] = Seq(
      "ivf" -> (() => graft.sources.IvfIndex.ensureBuilt(s, d)),
      "ivf_auto" -> (() => graft.sources.IvfIndex.ensureBuiltAuto(s, d)),
      "ivf_routed" -> (() => graft.sources.IvfIndex.ensureBuiltRouted(s, d)),
      "text" -> (() => graft.sources.TextIndex.ensureBuilt(s, d)),
      "dedup" -> (() => graft.sources.DedupIndex.ensureBuilt(s, d)),
      "dedup_full" -> (() => graft.sources.DedupIndex.ensureBuiltFull(s, d)),
      "media_image" -> (() => graft.sources.MediaIndex.ensureBuiltImage(s, d)),
      "media_audio" -> (() => graft.sources.MediaIndex.ensureBuiltAudio(s, d)),
      "media_audio_corpus" -> (() => graft.sources.MediaIndex.ensureBuiltAudioCorpus(s, d)),
      "video" -> (() => graft.sources.VideoIndex.ensureBuiltVideo(s, d)),
      "video_clip" -> (() => graft.sources.VideoIndex.ensureBuiltVideoClip(s, d)),
      "video_perc" -> (() => graft.sources.VideoIndex.ensureBuiltVideoPerc(s, d)),
      "video_clip_perc" -> (() => graft.sources.VideoIndex.ensureBuiltVideoClipPerc(s, d)),
      "video_corpus" -> (() => graft.sources.VideoIndex.ensureBuiltVideoCorpus(s, d)),
      "audio_seg" -> (() => graft.sources.VideoIndex.ensureBuiltAudioSeg(s, d)),
      "audio_seg_corpus" -> (() => graft.sources.VideoIndex.ensureBuiltAudioSegCorpus(s, d)),
      "image_rows" -> (() => graft.sources.VideoIndex.ensureBuiltImageRows(s, d)),
      "image_rows_corpus" -> (() => graft.sources.VideoIndex.ensureBuiltImageRowsCorpus(s, d)),
      "image_blocks" -> (() => graft.sources.VideoIndex.ensureBuiltImageBlocks(s, d)),
      "image_blocks_corpus" -> (() => graft.sources.VideoIndex.ensureBuiltImageBlocksCorpus(s, d)),
      "video_kf" -> (() => graft.sources.VideoIndex.ensureBuiltVideoKeyframes(s, d)),
      "video_kf_clip" -> (() => graft.sources.VideoIndex.ensureBuiltVideoKeyframesClip(s, d)))
    fixtures.foreach { case (name, build) =>
      val t0 = System.nanoTime()
      try {
        build()
        System.err.println(f"[bench-warmup] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench-warmup] $name FAILED: ${e.getClass.getSimpleName}")
      }
    }
  }

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

    val benchStart = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - benchStart) / 1e9

    // ---- untimed warmup: tables, codegen shapes, stored fixtures, b_* setups
    Seq("lineitem", "orders", "documents", "embeddings", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try {
      import spark.implicits._
      graft.graph.Iterative.ccFind(
        Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")).count()
    } catch { case _: Throwable => () }
    warmFixtures(spark, sfDir)
    benchOnly.toSeq.sortBy(_._1).foreach { case (name, e) =>
      e.setup.foreach { su =>
        val t0 = System.nanoTime()
        try {
          su(spark, sfDir)
          System.err.println(f"[bench-setup] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.1f s")
        } catch {
          case ex: Throwable =>
            System.err.println(s"[bench-setup] $name FAILED: ${ex.getClass.getSimpleName}")
        }
      }
    }
    System.err.println(f"[bench] warmup done at $elapsed%.1f s wall")

    val qEntries: Seq[(String, (SparkSession, String) => DataFrame)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
    val bEntries: Seq[(String, (SparkSession, String) => DataFrame)] =
      benchOnly.toSeq.sortBy(_._1).map { case (n, e) => n -> e.run }
    val allNames: Seq[String] = (qEntries ++ bEntries).map(_._1).sorted

    // Shared mutable state, guarded by `lock` (the shutdown hook reads it).
    val lock = new Object
    val samples = scala.collection.mutable.LinkedHashMap(
      allNames.map(_ -> Vector.empty[Double]): _*)
    val curtailed = scala.collection.mutable.LinkedHashSet.empty[String]
    var spent = 0.0 // cumulative sample wall, seconds (incl. failed attempts)

    /** One timed run; None if the query threw. The frame is bound outside
      * the try so its checkpoints are released even on failure. A FAILED
      * attempt records no sample but its wall still charges the budget
      * (r16 ADVICE: a hanging-then-throwing family must not blow the
      * driver window the guard exists to bound). */
    def timeOnce(fn: (SparkSession, String) => DataFrame): Option[Double] = {
      var df: DataFrame = null
      val t0 = System.nanoTime()
      try {
        df = fn(spark, sfDir)
        df.count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case _: Throwable =>
          lock.synchronized { spent += (System.nanoTime() - t0) / 1e9 }
          None
      } finally {
        if (df != null) {
          try graft.core.Checkpoints.release(df)
          catch { case _: Throwable => () }
        }
      }
    }

    def f(v: Double): String = "%.3f".formatLocal(Locale.ROOT, v)
    def fOpt(v: Option[Double]): String = v.map(f).getOrElse("null")

    /** Snapshot → (results, failed) under the lock. */
    def snapshot(): (Seq[(String, Option[Double])], Seq[String]) = lock.synchronized {
      val res = allNames.map { n =>
        val s = samples(n)
        n -> (if (s.isEmpty) None else Some(s.min))
      }
      (res, res.collect { case (n, None) => n })
    }

    def headlineLine(partial: Boolean): String = {
      val (results, failed) = snapshot()
      val byName = results.toMap
      val total = results.flatMap(_._2).sum
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val (curN, spentNow) = lock.synchronized((curtailed.size, spent))
      def line(hl: Seq[String]): String = {
        val m = hl.filter(byName.contains)
          .map(k => "\"" + k + "\":" + fOpt(byName(k)))
          .mkString("{", ",", "}")
        s"""{"metric":"total","value":${f(total)},"unit":"sec",""" +
          s""""queries":$m,"sf":"$sfDir","n_queries":${results.size},""" +
          s""""n_failed":${failed.size},"failed":$failedJson,""" +
          s""""passes":$passes,"partial":$partial,"curtailed_n":$curN,""" +
          s""""sample_wall":${f(spentNow)},"hl_dropped":${headline.size - hl.size},""" +
          s""""detail":"bench_out.json"}"""
      }
      // hard cap: the driver keeps ~2,000 chars of stdout tail and sbt's
      // `[success] Total time …` line lands after ours, so stay well
      // inside it; drop headline queries from the end (counted in
      // hl_dropped, never silent) to fit.
      var hl = headline
      var out = line(hl)
      while (out.length > 1800 && hl.nonEmpty) { hl = hl.dropRight(5); out = line(hl) }
      out
    }

    /** Full-detail artifact, rewritten after every completed entry so a
      * killed process leaves the freshest partial detail on disk. */
    def writeDetail(partial: Boolean): Unit = {
      val (results, failed) = snapshot()
      val total = results.flatMap(_._2).sum
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val (curt, spentNow) = lock.synchronized((curtailed.toSeq, spent))
      val curtJson = curt.map("\"" + _ + "\"").mkString("[", ",", "]")
      val m = results.map { case (k, v) => "\"" + k + "\":" + fOpt(v) }
        .mkString("{", ",", "}")
      val raw = lock.synchronized {
        samples.map { case (k, s) =>
          "\"" + k + "\":" + s.map(f).mkString("[", ",", "]")
        }.mkString("{", ",", "}")
      }
      val j =
        s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$m,""" +
          s""""sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size},""" +
          s""""failed":$failedJson,"passes":$passes,"partial":$partial,""" +
          s""""curtailed":$curtJson,"sample_wall":${f(spentNow)},"samples":$raw}"""
      try {
        val w = new java.io.PrintWriter("bench_out.json")
        try w.println(j) finally w.close()
      } catch { case _: Throwable => () }
    }

    // Shutdown hook: if the driver's timeout kills us mid-loop, print the
    // partial headline (log level OFF first so shutdown noise doesn't
    // bury the line in the driver's stdout tail).
    val printed = new java.util.concurrent.atomic.AtomicBoolean(false)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!printed.getAndSet(true)) {
        try spark.sparkContext.setLogLevel("OFF") catch { case _: Throwable => () }
        try org.apache.log4j.LogManager.getRootLogger
          .setLevel(org.apache.log4j.Level.OFF)
        catch { case _: Throwable => () }
        println(headlineLine(partial = true))
        System.out.flush()
      }
    }))

    def record(name: String, sample: Option[Double]): Unit = lock.synchronized {
      sample.foreach { t => samples(name) = samples(name) :+ t; spent += t }
    }
    def overBudget: Boolean = lock.synchronized(spent >= budgetSec)
    def minOf(name: String): Option[Double] = lock.synchronized {
      val s = samples(name); if (s.isEmpty) None else Some(s.min)
    }

    // ---- timed loop.
    // Pass 1: every q_* entry runs ONCE (mandatory — nothing else burns
    // budget before every entry has a number); then every b_* window
    // runs exactly once (after the q_* loop, so the single window
    // sample never pays the suite's coldest codegen). Later passes:
    // q_* only, in DESCENDING current-min order — the expensive tail
    // (where a cold first sample hides the most error) confirms first,
    // cheap entries only if budget remains (r16 verdict finding #1).
    // All non-mandatory runs respect the budget.
    for (pass <- 1 to passes) {
      val order =
        if (pass == 1) qEntries
        else qEntries.sortBy { case (n, _) => -minOf(n).getOrElse(0.0) }
      order.foreach { case (name, fn) =>
        if (pass == 1) record(name, timeOnce(fn))
        else if (minOf(name).isDefined) { // broken entries don't re-prove it
          if (!overBudget) record(name, timeOnce(fn))
          else curtailed += name
        }
        writeDetail(partial = true)
      }
      if (pass == 1) {
        bEntries.foreach { case (name, fn) =>
          record(name, timeOnce(fn)) // mandatory single sample
          writeDetail(partial = true)
        }
      }
      System.err.println(f"[bench] pass $pass done: sample wall ${lock.synchronized(spent)}%.1f s, total wall $elapsed%.1f s")
    }

    writeDetail(partial = false)
    spark.stop()
    if (!printed.getAndSet(true)) println(headlineLine(partial = false))
  }
}
