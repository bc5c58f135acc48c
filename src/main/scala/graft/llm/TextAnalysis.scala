package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, heuristic language ID, content fingerprinting.
  * All pure column expressions (whole-stage codegen, no UDFs) and each
  * re-expressible in ANSI SQL for the DuckDB oracle.
  */
object TextAnalysis {

  private def words(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")

  /** Token statistics: whitespace tokens, BPE-ish tokens (word pieces +
    * standalone punctuation), characters. */
  def tokenStats(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(words(col(textCol))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("\\w+|[^\\w\\s]"), lit(0)))
        .cast("long").as("n_bpe_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Quality signals: word count, mean word length, stopword ratio,
    * punctuation ratio, and a blended score. Single projection, no shuffle. */
  def qualityScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nWords = size(ws)
    val meanLen = aggregate(transform(ws, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double") / nWords
    val stopRatio = size(filter(ws, w => w.isInCollection(stopwords)))
      .cast("double") / nWords
    val punctRatio = size(regexp_extract_all(col(textCol), lit("[^\\w\\s]"), lit(0)))
      .cast("double") / length(col(textCol))
    docs.select(
      col(idCol),
      nWords.cast("long").as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      // blended heuristic: long-enough docs with natural stopword density
      // and little punctuation noise score higher
      round(
        least(nWords.cast("double") / 100.0, lit(1.0)) * 0.4 +
          least(stopRatio * 5.0, lit(1.0)) * 0.4 +
          (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.2,
        4).as("quality"))
  }

  /** Heuristic language ID: marker-word rules (the real-corpus version
    * scores character n-gram profiles; the rule chain keeps the operator
    * deterministic and oracle-checkable). */
  def langId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
    docs.select(col(idCol),
      when(padded.contains(" the ") || padded.contains(" is "), "en")
        .when(padded.contains(" le ") || padded.contains(" et "), "fr")
        .when(padded.contains(" der ") || padded.contains(" und "), "de")
        .when(padded.contains(" el ") || padded.contains(" y "), "es")
        .otherwise("und").as("lang_pred"))
  }

  /** Content fingerprint: md5 over case/whitespace-normalized text —
    * the join key for exact dedup across differently-formatted copies. */
  def fingerprint(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
      md5(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")).cast("binary"))
        .as("fp"))

  /** Winnowing fingerprint (rolling k-gram hashes → sliding-window
    * minima, [[graft.functions.WinnowFingerprint]]): unlike [[fingerprint]]
    * this survives partial overlap — shared byte runs select shared grams
    * regardless of alignment, the standard copy-containment signal.
    * Emits the selected-hash set as a comma-joined string (harness-safe)
    * plus its size; docs shorter than k+w-1 bytes carry an empty set. */
  def winnowFingerprint(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val sel = graft.functions.WinnowFingerprint.winnow(col(textCol), k, w)
    docs.select(col(idCol),
      coalesce(array_join(transform(sel, _.cast("string")), ","), lit(""))
        .as("fp_set"),
      coalesce(size(sel).cast("long"), lit(0L)).as("n_grams"))
  }
}
