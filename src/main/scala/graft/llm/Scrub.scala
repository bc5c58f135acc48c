package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / pattern scrubbing — the redaction step a training-data curation
  * pipeline runs alongside the quality and repetition filters (rounds
  * out SURVEY §7.2.8's curation suite; no reference analog — the
  * reference's text ops stop at tokenization).
  *
  * One zero-shuffle projection per document: category counts are taken
  * BEFORE redaction (so they report what was found, not what remains)
  * and the replacements are a fixed-order `regexp_replace` chain — all
  * codegen'd Catalyst regex expressions, no UDFs. The pattern set is
  * deliberately engine-portable (no backreferences, no lookaround), so
  * Java's regex and RE2-family engines (the DuckDB oracle) agree match
  * for match; patterns are ordered so no earlier replacement token can
  * be matched by a later pattern.
  *
  * 100 TB design: the regex stack is per-row CPU on the scan — it
  * pipelines inside whole-stage codegen with zero shuffle, so it scales
  * with executors like any map. If profiling ever shows the java.util
  * .regex engine dominating the scan (many patterns × long docs), the
  * escalation path is a single-pass native expression over the byte
  * stream (the [[graft.functions.TextStats]] discipline); at three
  * anchored patterns the stock expressions measure fine.
  */
object Scrub {

  /** (category, pattern, replacement) — fixed application order. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phones", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ssns", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"))

  /** Redact a text column: every match of every [[piiPatterns]] entry
    * replaced by its category token. */
  def scrubbed(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** (doc_id, clean_text, n_emails, n_phones, n_ssns): redacted text +
    * per-category found-counts, one scan, zero shuffles. */
  def piiScrub(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val countCols = piiPatterns.map { case (cat, pat, _) =>
      regexp_count(col(textCol), lit(pat)).cast("long").as(s"n_$cat")
    }
    docs.select(
      col(idCol).as("doc_id") +: scrubbed(col(textCol)).as("clean_text") +:
        countCols: _*)
  }

  /** Keyed pseudonymization: replace an integer identifier with a
    * stable opaque token derived from the portable mixer under `seed` —
    * the same id maps to the same token in EVERY table sharing the
    * seed, so joins and group-bys survive while raw identifiers leave
    * the dataset (keyed tokenization for pipeline hygiene, NOT
    * cryptography — the map is affine mod a prime, so a single known
    * (id, token) pair algebraically reverses the ENTIRE mapping, and
    * rotating the seed only unlinks releases against non-adversarial
    * correlation; a keyed cryptographic PRF drops in at the same call
    * site if an adversarial threat model applies). Zero-shuffle
    * projection; the id is reduced mod 1e9+7 before the multiply (the
    * [[Sampling.bucket]] ANSI overflow discipline).
    *
    * PRECONDITION — id range: the mapping is injective only for ids in
    * [0, 1e9+7). Larger ids are folded mod 1e9+7 FIRST, so two distinct
    * real ids that differ by a multiple of 1e9+7 map to the SAME token,
    * silently merging identities in downstream joins/group-bys. At
    * large-id scale (e.g. 64-bit snowflake ids) pre-hash the full key
    * into [0, 1e9+7) with a collision-audited map, or widen the token
    * domain, before calling this. */
  def pseudonymize(df: DataFrame, idCols: Seq[String],
      seed: Long = 7L): DataFrame =
    idCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, concat(lit("anon_"),
        pmod(pmod(col(c).cast("long"), lit(1000000007L)) * lit(2654435761L)
          + lit(seed * 40503L), lit(1000000007L))))
    }

  /** k-anonymity audit over quasi-identifier columns: every distinct
    * quasi-identifier combination with its occupancy and whether it
    * violates `k` (fewer than k rows share it — those rows are
    * re-identifiable at the audited granularity). One map-side-partial
    * aggregate; the shuffle carries (combination, count) cells, never
    * rows. The release gate is `violations == 0`; the per-combination
    * frame (bounded by the quasi-identifier cardinality product, tiny
    * relative to the data) feeds suppression or generalization. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "audit requires at least one column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("violates_k", col("group_n") < k)
  }

  /** l-diversity audit — k-anonymity's standard companion (Machanavajjhala
    * et al. 2007): a quasi-identifier group can satisfy k (enough rows
    * share the combination) yet still leak the SENSITIVE attribute if
    * every row in the group carries the same value — re-identification
    * isn't needed when the answer is unanimous. Per quasi-identifier
    * combination: occupancy, the number of DISTINCT sensitive values,
    * and the violation gate (diversity < l). Same aggregate shape as
    * [[kAnonymityAudit]] — one map-side-partial count-distinct per
    * group; the shuffle carries (combination, value) cells, never rows;
    * the release gate is `violations == 0` and violating groups feed
    * suppression. */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "audit requires at least one column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("diversity"))
      .withColumn("violates_l", col("diversity") < l)
  }

  /** Phrase-blocklist audit — the content-filter step a curation
    * pipeline runs against a banned-term/URL/boilerplate list: every
    * document is scored by its occurrences of any blocklist phrase,
    * with exact whitespace-token phrase matching (a phrase of L words
    * matches the document's word-L-shingle stream — no substring false
    * positives: "ass" never hits "class"). Returns every doc as
    * (doc_id, n_hits, terms, clean): total match occurrences, the
    * sorted distinct phrases found (newline-joined — a separator no
    * phrase can contain, since tokens are whitespace-split and shingles
    * re-join with single spaces; a comma join would be ambiguous the
    * moment a phrase token carries a comma, r9 ADVICE), and the `clean`
    * gate the filter keys on.
    *
    * 100 TB shape: the blocklist (config-sized — even a 100 k-phrase
    * list is a few MB) BROADCASTS into the doc shingle stream — one
    * hash-join per distinct phrase word-length, no shuffle of the
    * corpus; the per-doc aggregate partial-aggregates map-side. This is
    * the join-shaped alternative to an `isin` literal chain, which
    * stops being viable past a few hundred phrases. Document-side work
    * is one shingle generation per distinct phrase length present in
    * the list (typically 1–3). */
  def blocklistHits(docs: DataFrame, textCol: String, idCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "blocklist must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = split(col(textCol), "\\s+")
    val byLen = phrases.distinct.groupBy(_.split("\\s+").length).toSeq
      .sortBy(_._1)
    val hitStream = byLen.map { case (len, ps) =>
      docs.select(col(idCol).as("doc_id"),
          explode(graft.functions.ShingleArray.shinglesAll(toks, len))
            .as("term"))
        .join(broadcast(ps.toDF("term")), "term")
    }.reduce(_ unionByName _)
    val agg = hitStream.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        array_join(sort_array(collect_set(col("term"))), "\n").as("terms"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("terms"), lit("")).as("terms"),
        (coalesce(col("n_hits"), lit(0L)) === 0L).as("clean"))
  }

  /** [[blocklistHits]] as a STATELESS projection — the ingest-time gate
    * shape. Same output contract row for row ((doc_id, n_hits, terms,
    * clean), occurrences counted, distinct sorted newline-joined terms),
    * but the per-doc tally is computed inside one row's expression tree
    * (array `filter` over the same [[graft.functions.ShingleArray]]
    * shingles, phrases as an in-plan literal) instead of
    * explode → broadcast-join → groupBy. No shuffle, no state: a
    * streaming micro-batch scores row-for-row what a batch backfill
    * scores, which is what makes it legal in an Append-mode stream.
    *
    * The literal-array membership scan is O(|phrases|) per shingle, so
    * this shape is for config-sized gate lists (the production ingest
    * gate); a 100 k-phrase audit belongs to [[blocklistHits]]'s
    * broadcast-join, whose cost is hash-bounded. */
  def blocklistGate(docs: DataFrame, textCol: String, idCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "blocklist must be non-empty")
    val toks = split(col(textCol), "\\s+")
    val matchedPerLen = phrases.distinct.groupBy(_.split("\\s+").length)
      .toSeq.sortBy(_._1)
      .map { case (len, ps) =>
        filter(graft.functions.ShingleArray.shinglesAll(toks, len),
          x => array_contains(typedlit(ps.sorted), x))
      }
    val hits = flatten(array(matchedPerLen: _*))
    docs.select(col(idCol).as("doc_id"),
      size(hits).cast("long").as("n_hits"),
      array_join(array_sort(array_distinct(hits)), "\n").as("terms"),
      (size(hits) === 0).as("clean"))
  }
}
