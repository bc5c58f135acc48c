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
}
