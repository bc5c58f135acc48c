package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-ranked vocabulary build + out-of-vocabulary-aware encode —
  * the tokenizer-adjacent step of a training-data pipeline: fix a
  * top-V token inventory over the corpus (the reference's closest
  * analog is `oink/wordfreq.cpp`'s Ntop cut), give each token a dense
  * id by (count desc, token asc) — rank 1..V, 0 reserved for OOV —
  * then map every document's token stream through it, reporting OOV
  * mass per document. Both halves are deterministic: no RNG, no
  * engine-private hash, so an oracle replays ids and checksums exactly.
  *
  * 100 TB shape: the vocabulary is a wordfreq-class aggregate (map-side
  * partial counts, shuffle carries (token, count)) cut by
  * TakeOrdered — distributed; only the final id numbering is a
  * single-task window over the ALREADY-CUT V rows (V is a parameter,
  * 10^4..10^6 — driver-bounded by construction). Encoding broadcasts
  * the V-row vocabulary into the token scan and re-aggregates per doc
  * with map-side partials; the corpus itself never sort-merge-joins.
  */
object Vocab {

  val M = 1000000007L

  /** Non-empty whitespace tokens with their 0-based position AFTER
    * empty-token removal (matching the `list_filter(length > 0)`
    * oracle tokenization). */
  private def toks(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(filter(split(col(textCol), "\\s+"),
          w => length(w) > 0)).as(Seq("pos", "w")))

  /** Top-`size` vocabulary: (w, n, id) with id = 1..size assigned by
    * (count desc, token asc). The window runs on ≤ size rows — the
    * distributed part is the count aggregate + TakeOrdered cut. */
  def build(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    val counts = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(size)
    counts.withColumn("id",
      row_number().over(Window.orderBy(col("n").desc, col("w").asc))
        .cast("long"))
  }

  /** Per-document encode summary against `vocab` (from [[build]]):
    * (idCol, n_tokens, n_oov, ids_checksum) where the checksum is
    * Σ_pos (pos+1)·(id_pos + 7) mod 1e9+7 with OOV id = 0 — an
    * order-sensitive digest of the encoded sequence any engine
    * recomputes in plain int64 SQL (each term is reduced mod M BEFORE
    * the sum, so the running long overflows only past ~9·10^9 tokens
    * in one document — far beyond any real document). */
  def encodeSummary(docs: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame): DataFrame = {
    val t = toks(docs, textCol, idCol)
      .join(broadcast(vocab.select(col("w"), col("id"))), Seq("w"), "left")
    t.groupBy(col(idCol)).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_oov"),
        pmod(sum(pmod((col("pos") + 1L) * (coalesce(col("id"), lit(0L)) + 7L),
          lit(M))), lit(M)).as("ids_checksum"))
  }
}
