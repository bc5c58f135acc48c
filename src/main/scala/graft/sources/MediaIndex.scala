package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** PERSISTED media fingerprint index — the multimodal member of the
  * stored-index family ([[IvfIndex]] vectors, [[TextIndex]] lexical,
  * [[DedupIndex]] text near-dup), closing the r13 verdict's one `weak`:
  * q_image_dedup / q_audio_dedup re-decoded every payload and recomputed
  * every dHash on every run — the ×100 decomposition (R13MediaProbe) put
  * that at 33.6 s of the 83.4 s row, honest linear INGEST work being
  * paid at QUERY time. This index stores the 128-bit perceptual
  * fingerprint once, at ingest, as one bucketed table:
  *
  *   - `<name>_fp` (media_id, h_lo, h_hi): one 16-byte fingerprint row
  *     per media item ([[Multimodal.imageDHash]] spatial gradients or
  *     [[Multimodal.audioDHash]] temporal envelope gradients — the
  *     index is kind-agnostic: the fingerprint CONTRACT is the two
  *     non-negative 32-bit halves, whatever hashed them), bucketed by
  *     media_id so [[remove]]'s anti-join and [[Compact.compactTable]]
  *     ride the standard one-bucket-per-task rewrite.
  *
  * Serving ([[pairs]]) runs the exact-fingerprint-collapsed band +
  * Hamming-verify stage ([[Multimodal.dhashPairs]] — the seam was built
  * for a fingerprint frame) over the stored rows: payloads are never
  * read, codecs never run, and the scan is 16-byte rows instead of the
  * corpus's media bytes. At 100 TB of media that is the difference
  * between scanning a fingerprint sidecar and re-decoding the corpus —
  * the same economics the reference gets from persisting its computed
  * posting-list layout instead of re-deriving it per query
  * (`cuda/InvertedIndex.cu:463-513`).
  *
  * Lifecycle matches the sibling families: [[build]] / [[append]] (a
  * crawl batch pays |batch| decode+hash, nothing touches the stored
  * corpus) / [[compact]] / [[remove]] (takedowns stop matching future
  * re-crawls, the [[DedupIndex.remove]] erasure contract) /
  * [[graft.streaming.Streams.streamMediaIngest]] (the fingerprint
  * computed in the micro-batch that crawled the payload). The caller
  * owns id freshness, exactly the [[IvfIndex.append]] contract. */
object MediaIndex {

  /** Write the fingerprint table. `fingerprints` is (media_id, h_lo,
    * h_hi) from [[Multimodal.imageDHash]] / [[Multimodal.audioDHash]] —
    * the decode+hash pass runs HERE, once, which is the entire point:
    * build cost is the linear ingest work the live queries were
    * re-paying per run. */
  def build(spark: SparkSession, fingerprints: DataFrame, name: String,
      buckets: Int = 16, maxBandDf: Int = 10000,
      basePath: String = IvfIndex.defaultBase): Unit = {
    fingerprints.select(col("media_id"), col("h_lo"), col("h_hi"))
      .repartition(col("media_id")) // 1 file/bucket (IvfIndex recipe)
      .write.mode("overwrite").format("parquet")
      .option("path", s"$basePath/${name}_fp")
      .bucketBy(buckets, "media_id").sortBy("media_id")
      .saveAsTable(s"${name}_fp")
    spark.sql(s"ALTER TABLE ${name}_fp SET TBLPROPERTIES " +
      s"('graft.maxBandDf'='$maxBandDf')")
    refreshBandStop(spark, name, basePath)
  }

  /** [[build]] at the [[Bucketing.autoBuckets]] dial: the fingerprint
    * frame is checkpointed (the decode+hash pass must not run twice),
    * counted, and written with bytes-per-bucket-targeted buckets — the
    * bucket-count analog of [[IvfIndex.ensureBuiltAuto]], calibrated by
    * the R15VideoProbe measurement (see [[Bucketing.autoBuckets]]).
    * Returns the chosen bucket count; fixture AND rehearsal scales stay
    * at the measured-optimal 16-bucket floor. */
  def buildAuto(spark: SparkSession, fingerprints: DataFrame,
      name: String, maxBandDf: Int = 10000,
      basePath: String = IvfIndex.defaultBase): Int = {
    val f = fingerprints.localCheckpoint()
    val k = Bucketing.autoBuckets(f.count())
    build(spark, f, name, buckets = k, maxBandDf = maxBandDf,
      basePath = basePath)
    k
  }

  /** The build-time band-df dial, read back from the `_fp` table
    * property (survives [[Compact.compactTable]]'s swap — it re-applies
    * `graft.*` properties). */
  def storedMaxBandDf(spark: SparkSession, name: String): Int =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(s"${name}_fp"))
      .properties.get("graft.maxBandDf").map(_.toInt).getOrElse(10000)

  /** The stored fingerprints' 4×16-bit bands. */
  private def fpBands(fp: DataFrame): DataFrame =
    fp.select(explode(array(
      struct(lit(0).as("bi"), (col("h_lo") % 65536L).as("bv")),
      struct(lit(1).as("bi"), expr("h_lo div 65536L").as("bv")),
      struct(lit(2).as("bi"), (col("h_hi") % 65536L).as("bv")),
      struct(lit(3).as("bi"), (expr("h_hi div 65536L")).as("bv"))))
      .as("b"))
      .select(col("b.bi").as("bi"), col("b.bv").as("bv"))

  /** (Re)derive the band-value stop sidecar — `_bstop` = (bi, bv) pairs
    * carried by more than `maxBandDf` DISTINCT fingerprints (see
    * [[Multimodal.dhashPairs]]'s discipline scaladoc for why distinct
    * fingerprints, not media: identical-fp floods are collapsed, and a
    * media count would stop a popular item's bands and wrongly admit
    * its re-fetches). Distinct-fp counts are NOT sum-decomposable
    * across appends (the same fingerprint can recur in later batches),
    * so unlike [[VideoIndex]]'s media-count logs this re-derives from
    * the `_fp` table — a 16-byte-row scan, no payload, no decode: the
    * cheap-by-construction pass [[append]] can afford per batch, which
    * keeps the gate's stop set EXACT between maintenance windows. */
  def refreshBandStop(spark: SparkSession, name: String,
      basePath: String = IvfIndex.defaultBase): Long = {
    val maxBandDf = storedMaxBandDf(spark, name)
    val bstop = fpBands(spark.table(s"${name}_fp")
        .select(col("h_lo"), col("h_hi")).distinct())
      .groupBy(col("bi"), col("bv")).agg(count(lit(1)).as("df"))
      .where(col("df") > maxBandDf).select(col("bi"), col("bv"))
      .localCheckpoint()
    bstop.coalesce(1).write.mode("overwrite").format("parquet")
      .option("path", s"$basePath/${name}_bstop")
      .saveAsTable(s"${name}_bstop")
    // invalidate the cached file listing of the overwritten sidecar
    // (relation caches are per session; see VideoIndex.refreshStop)
    spark.catalog.refreshTable(s"${name}_bstop")
    spark.table(s"${name}_bstop").count()
  }

  /** Ingest a fresh batch's fingerprints: |batch| decode+hash upstream,
    * one bucket-aligned insert here — the stored corpus's payloads are
    * not read; the band-stop sidecar re-derives from the 16-byte
    * fingerprint rows (see [[refreshBandStop]]) so a band value
    * crossing the dial is capped at append time. */
  def append(spark: SparkSession, name: String,
      freshFp: DataFrame): Unit = {
    freshFp.select(col("media_id"), col("h_lo"), col("h_hi"))
      .write.mode("append").insertInto(s"${name}_fp")
    refreshBandStop(spark, name)
  }

  /** Near-dup pairs from the STORED fingerprints — byte-identical
    * answers to the live [[Multimodal.imageDedupPairs]] /
    * [[Multimodal.audioDedupPairs]] over the same corpus (the pair
    * stage is a pure function of the fingerprint frame; MediaIndexSpec
    * pins it), with the decode+fingerprint term gone from the query and
    * the persisted band-df dial applied. */
  def pairs(spark: SparkSession, name: String,
      maxDist: Int = 6): DataFrame =
    Multimodal.dhashPairs(spark.table(s"${name}_fp"), maxDist,
      storedMaxBandDf(spark, name),
      Some(spark.table(s"${name}_bstop")))

  /** INCREMENTAL near-dup check — the crawl-admission shape
    * ([[DedupIndex.dedupAgainst]]'s media analog): band a fresh batch's
    * fingerprints against the STORED corpus only, returning the CROSS
    * matches (fid, cid, dist). One pass, shaped for 100 TB: the fresh
    * side (|batch| rows, 4 band keys + the 16-byte code each) rides a
    * BROADCAST, so the stored fingerprint table streams map-side
    * through the band equi-join with the Hamming verification inline —
    * no shuffle of anything corpus-sized, no second corpus join for
    * verification (both codes are already on the matched row); the one
    * exchange is the final (fid, cid) dedup of multi-band hits, whose
    * input the map-side partial agg bounds by the match count, not the
    * corpus. Recall contract = the banded family's (a shared 16-bit
    * band is required — [[Multimodal.dhashPairs]]'s own candidate
    * rule); MediaIndexSpec pins pairsAgainst ≡ dhashPairs over the
    * union restricted to cross pairs. Intra-batch pairs follow the
    * cross-only contract ([[DedupIndex.dedupAgainst]] semantics); the
    * caller owns id freshness, so fid/cid collisions don't occur. */
  def pairsAgainst(spark: SparkSession, name: String, freshFp: DataFrame,
      maxDist: Int = 6): DataFrame =
    pairsAgainstFp(spark.table(s"${name}_fp"), freshFp, maxDist,
      Some(spark.table(s"${name}_bstop")))

  /** [[pairsAgainst]] over an explicit corpus fingerprint frame — the
    * seam (the [[Multimodal.dhashPairs]] frame-input discipline) that
    * lets the recompute twin pay live derivation through the SAME plan,
    * so stored-vs-live timings differ only in where the corpus
    * fingerprints come from. */
  def pairsAgainstFp(storedFp: DataFrame, freshFp: DataFrame,
      maxDist: Int = 6, stopBands: Option[DataFrame] = None): DataFrame = {
    def bandsOf(df: DataFrame, id: String, lo: String, hi: String) =
      df.select(col("media_id").as(id), col("h_lo").as(lo),
          col("h_hi").as(hi))
        .select(col(id), col(lo), col(hi), explode(array(
          struct(lit(0).as("bi"), (col(lo) % 65536L).as("bv")),
          struct(lit(1).as("bi"), expr(s"$lo div 65536L").as("bv")),
          struct(lit(2).as("bi"), (col(hi) % 65536L).as("bv")),
          struct(lit(3).as("bi"), expr(s"$hi div 65536L").as("bv"))))
          .as("b"))
        .select(col(id), col(lo), col(hi), col("b.bi").as("bi"),
          col("b.bv").as("bv"))
    // band-df discipline on the fresh side: hot band values (df over
    // the CORPUS's distinct fingerprints — the `_bstop` sidecar when
    // serving an index, derived inline for the recompute twin) are
    // dropped before the broadcast so they never fan out map-side
    val stop = stopBands.getOrElse(
      fpBands(storedFp.select(col("h_lo"), col("h_hi")).distinct())
        .groupBy(col("bi"), col("bv")).agg(count(lit(1)).as("df"))
        .where(col("df") > 10000).select(col("bi"), col("bv")))
    val fB = broadcast(
      bandsOf(freshFp, "fid", "la", "ha")
        .join(broadcast(stop), Seq("bi", "bv"), "left_anti")
        .localCheckpoint())
    val sB = bandsOf(storedFp, "cid", "lb", "hb")
    sB.join(fB, Seq("bi", "bv"))
      .select(col("fid"), col("cid"),
        (expr("bit_count(la ^ lb)") + expr("bit_count(ha ^ hb)"))
          .cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      // a pair can match on up to 4 bands; dist is a pure function of
      // the two codes, so min() just collapses the duplicates
      .groupBy(col("fid"), col("cid")).agg(min(col("dist")).as("dist"))
  }

  /** Admit the fresh fingerprints with NO stored near-dup — the media
    * crawl-admission gate ([[DedupIndex.dedupAgainst]]'s contract:
    * cross-only, corpus side never re-derived). Feed the admitted rows
    * to [[append]] and the next batch gates against corpus ∪ batch. */
  def dedupAgainst(spark: SparkSession, name: String, freshFp: DataFrame,
      maxDist: Int = 6): DataFrame =
    freshFp.join(
      pairsAgainst(spark, name, freshFp, maxDist)
        .select(col("fid").as("media_id")).distinct(),
      Seq("media_id"), "left_anti")

  /** Maintenance: one-file-per-bucket rewrite of the appended
    * fingerprint table ([[Compact.compactTable]] contract) + band-stop
    * re-derivation under the persisted dial. */
  def compact(spark: SparkSession, name: String): Map[String, (Long, Long)] = {
    val r = Map(s"${name}_fp" -> Compact.compactTable(spark, s"${name}_fp"))
    refreshBandStop(spark, name)
    r
  }

  /** Scheduled maintenance: compact when fragmented, else no-op
    * ([[Compact.maintainTables]] — the composed-loop entry point,
    * r13 verdict #3); the band stop re-derives whenever the table was
    * rewritten. */
  def maintain(spark: SparkSession, name: String,
      maxFilesPerBucket: Double = 4.0): Map[String, (Long, Long)] = {
    val r = Compact.maintainTables(spark, Seq(s"${name}_fp"),
      maxFilesPerBucket)
    if (r.exists { case (_, (b, a)) => a < b }) refreshBandStop(spark, name)
    r
  }

  /** Maintenance: DELETE media from the index (takedowns, erasure). A
    * removed item stops pairing with future re-crawled copies — the
    * [[DedupIndex.remove]] semantic, one compaction pass, serve plans
    * untouched. */
  def remove(spark: SparkSession, name: String, ids: DataFrame,
      idCol: String = "media_id"): Map[String, (Long, Long)] = {
    val rid = broadcast(ids.select(col(idCol).cast("long").as("__rid"))
      .distinct().localCheckpoint())
    val r = Map(s"${name}_fp" -> Compact.compactTable(spark, s"${name}_fp",
      transform = df => df.join(rid, df("media_id") === rid("__rid"),
        "left_anti")))
    refreshBandStop(spark, name)
    r
  }

  case class BandRecallPoint(maxDist: Int, recall: Double,
      truthPairs: Long)

  /** Label-free recall re-probe for the banding dial — the
    * [[IvfIndex.reprobeRecall]] discipline for fingerprints, the step
    * R14MediaRecallProbe showed is mandatory knowledge for setting
    * maxDist (4×16 banding is pigeonhole-guaranteed only at dist ≤ 3;
    * measured 0.92/0.83/0.67 at 4/5/6 on the audio corpus): sample
    * `sampleSize` stored fingerprints as a probe batch, brute-force
    * Hamming truth against the whole corpus (sample BROADCAST, corpus
    * streams map-side — linear in the corpus with a 16-byte × sample
    * constant, the affordable maintenance-window pass), run the banded
    * gate at the widest swept dial, and report cumulative recall at
    * each dial. Call after [[maintain]]/[[compact]] whenever the corpus
    * composition drifted; feed the frontier to [[pickMaxDist]]. */
  def reprobeRecall(spark: SparkSession, name: String,
      maxDists: Seq[Int] = Seq(3, 4, 5, 6, 8),
      sampleSize: Int = 256): Seq[BandRecallPoint] = {
    require(maxDists.nonEmpty, "empty dial sweep")
    val fp = spark.table(s"${name}_fp")
    val sample = fp
      .orderBy(xxhash64(col("media_id")), col("media_id"))
      .limit(sampleSize)
      .select(col("media_id"), col("h_lo"), col("h_hi"))
      .localCheckpoint()
    val widest = maxDists.max
    val truth = fp
      .select(col("media_id").as("cid"), col("h_lo").as("lb"),
        col("h_hi").as("hb"))
      .crossJoin(broadcast(sample.select(col("media_id").as("fid"),
        col("h_lo").as("la"), col("h_hi").as("ha"))))
      .where(col("fid") =!= col("cid"))
      .select(col("fid"), col("cid"),
        (expr("bit_count(la ^ lb)") + expr("bit_count(ha ^ hb)"))
          .cast("long").as("dist"))
      .where(col("dist") <= widest)
      .localCheckpoint()
    val banded = pairsAgainst(spark, name, sample, widest)
      .where(col("fid") =!= col("cid"))
      .localCheckpoint()
    maxDists.sorted.map { d =>
      val t = truth.where(col("dist") <= d).count()
      val b = banded.where(col("dist") <= d).count()
      BandRecallPoint(d,
        if (t == 0L) 1.0 else b.toDouble / t, t)
    }
  }

  /** The dial decision over a [[reprobeRecall]] frontier: the WIDEST
    * swept maxDist whose measured banding recall still meets `target`
    * (match as tolerantly as the candidate rule honestly supports), or
    * the tightest swept dial when none does. */
  def pickMaxDist(frontier: Seq[BandRecallPoint],
      target: Double): Int = {
    require(frontier.nonEmpty, "empty recall frontier")
    frontier.sortBy(-_.maxDist).find(_.recall >= target)
      .getOrElse(frontier.minBy(_.maxDist)).maxDist
  }

  /** Memoized builds over the fixture corpora, keyed by (sfDir, data
    * fingerprint) — the [[DedupIndex.ensureBuilt]] discipline. Image:
    * the PNG-encoded media table. Audio: corpus ∪ the 0.9×-amplitude
    * re-crawl batch, matching q_audio_dedup's live input. */
  private val built = scala.collection.concurrent.TrieMap.empty[
    (String, String, String), String]

  private def corpusFp(spark: SparkSession, sfDir: String): String = {
    val r = graft.Tables.documents(spark, sfDir)
      .agg(count(lit(1)), max(col("doc_id")), sum(col("n_chars"))).head()
    s"${r.get(0)}|${r.get(1)}|${r.get(2)}"
  }

  def ensureBuiltImage(spark: SparkSession, sfDir: String): String = {
    val fp = corpusFp(spark, sfDir)
    built.getOrElseUpdate((sfDir, fp, "image"), {
      val name = s"graft_media_img_${Bucketing.nameSuffix(sfDir + "|" + fp)}"
      build(spark,
        Multimodal.imageDHash(Multimodal.imageTable(spark, sfDir)), name)
      name
    })
  }

  def ensureBuiltAudio(spark: SparkSession, sfDir: String): String = {
    val fp = corpusFp(spark, sfDir)
    built.getOrElseUpdate((sfDir, fp, "audio"), {
      val name = s"graft_media_aud_${Bucketing.nameSuffix(sfDir + "|" + fp)}"
      build(spark,
        Multimodal.audioDHash(
          Multimodal.audioTable(spark, sfDir)
            .unionByName(Multimodal.audioScaledTable(spark, sfDir))), name)
      name
    })
  }

  /** Corpus-ONLY audio index — the stored side of the crawl-admission
    * shape ([[pairsAgainst]]/[[dedupAgainst]]): the re-crawl batch stays
    * fresh, never in the store. */
  def ensureBuiltAudioCorpus(spark: SparkSession, sfDir: String): String = {
    val fp = corpusFp(spark, sfDir)
    built.getOrElseUpdate((sfDir, fp, "audio_corpus"), {
      val name = s"graft_media_audc_${Bucketing.nameSuffix(sfDir + "|" + fp)}"
      build(spark,
        Multimodal.audioDHash(Multimodal.audioTable(spark, sfDir)), name)
      name
    })
  }
}
