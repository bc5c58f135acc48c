package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Trained subword (BPE) tokenization: fixed-round merge-rule training
  * over the corpus word-type table + OOV-aware document encoding — the
  * step past [[Vocab]]'s word-level Ntop inventory (the reference's
  * `oink/wordfreq.cpp:65-82` world) toward how production training-data
  * pipelines actually tokenize. No reference analog; the design follows
  * the published byte-pair-encoding algorithm (Sennrich et al. 2016):
  * greedy left-to-right pair merges learned by repeated most-frequent-
  * adjacent-pair selection.
  *
  * Everything is deterministic and engine-portable, so a SQL oracle
  * replays the WHOLE training run (the q_kmeans unrolled-round
  * discipline): a fixed round count K, exact integer pair counts,
  * (count desc, lhs asc, rhs asc) winner tie-break, and a string-level
  * merge application both engines share. A word's segmentation is
  * carried as a wrapped string — symbols joined by TWO spaces with one
  * leading/trailing space (`"ab"` → `" a  b "`); applying merge (a, b)
  * is then literal `replace(ss, " a  b ", " ab ")`, whose left-to-right
  * non-overlapping replace-all semantics (identical in Spark and
  * DuckDB) IS greedy BPE application — the wrapping spaces make a
  * mid-symbol match impossible and the double separator keeps adjacent
  * matches from stealing each other's boundary. Symbols contain no
  * whitespace by construction (words are whitespace-split), so the
  * encoding is unambiguous.
  *
  * 100 TB shape: the corpus is scanned ONCE (word-count aggregate,
  * map-side partial; the shuffle carries (word, count) cells). Every
  * training round then runs over the WORD-TYPE table — vocabulary-
  * sized, zipf-bounded, orders of magnitude smaller than the corpus —
  * with a (pair, count)-cell shuffle and a 1-row TakeOrdered winner
  * (the q_kmeans driver-scalar discipline). Encoding never re-runs
  * merges per token occurrence: the merge fold is applied once per
  * DISTINCT word and the resulting word→tokens table broadcasts into
  * the document token scan, as does the symbol-id vocabulary.
  */
object Bpe {

  val M = 1000000007L

  /** One learned merge rule. */
  final case class Merge(round: Int, lhs: String, rhs: String, count: Long)

  /** Non-empty whitespace tokens (the engine-wide tokenization). */
  private def words(docs: DataFrame, textCol: String): Column =
    filter(split(col(textCol), "\\s+"), w => length(w) > 0)

  /** `"ab"` → `" a  b "`: chars wrapped into the separator encoding. */
  private def wrapped(w: Column): Column =
    concat(lit(" "),
      array_join(filter(split(w, ""), s => length(s) > 0), "  "), lit(" "))

  /** (w, n, ss): word types with corpus counts and initial (character)
    * segmentations. The one corpus-sized scan of training. */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(docs, textCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .withColumn("ss", wrapped(col("w")))

  /** Apply one merge to a segmentation column — greedy left-to-right,
    * via literal replace-all over the wrapped encoding. */
  def applyMerge(ss: Column, lhs: String, rhs: String): Column =
    replace(ss,
      lit(" " + lhs + "  " + rhs + " "), lit(" " + lhs + rhs + " "))

  /** Adjacent-symbol pair counts over a types frame, weighted by word
    * count: (lhs, rhs, pair_count). Map-side-partial aggregate; the
    * shuffle carries (pair, count) cells — never segmentations. */
  def pairCounts(types: DataFrame): DataFrame =
    types.withColumn("s", split(trim(col("ss")), "  "))
      .select(col("n"), explode(expr(
        """CASE WHEN size(s) < 2 THEN array()
           ELSE transform(sequence(1, size(s) - 1),
             i -> struct(element_at(s, i) AS lhs, element_at(s, i + 1) AS rhs))
           END""")).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("n")).as("pair_count"))

  /** Train `rounds` merge rules; returns (merges, final types frame).
    * Each round: pair-count aggregate → 1-row deterministic winner
    * (count desc, lhs asc, rhs asc — the driver scalar, like every
    * iterative op here) → merge applied to the types frame. The types
    * frame is persisted per round so round r+1 rescans r's result, not
    * the corpus. */
  def train(docs: DataFrame, textCol: String,
      rounds: Int): (Seq[Merge], DataFrame) = {
    var types = wordTypes(docs, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Vector.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val win = pairCounts(types)
        .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (win.nonEmpty) {
        val row = win.head
        val (l, rr, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(r, l, rr, c)
        val next = types.withColumn("ss", applyMerge(col("ss"), l, rr))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        types.unpersist()
        types = next
      }
    }
    (merges.result(), types)
  }

  /** The learned merge table as a frame:
    * (round, lhs, rhs, merged, pair_count). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.round.toLong, m.lhs, m.rhs, m.lhs + m.rhs, m.count))
      .toDF("round", "lhs", "rhs", "merged", "pair_count")
  }

  /** Symbol-id vocabulary from a trained types frame: (sym, id) with
    * id = dense rank by symbol asc (1..S; 0 stays reserved for OOV).
    * The window runs over the S distinct symbols — vocabulary-sized. */
  def symbolVocab(types: DataFrame): DataFrame =
    types.select(explode(split(trim(col("ss")), "  ")).as("sym"))
      .distinct()
      .withColumn("id",
        row_number().over(Window.orderBy(col("sym").asc)).cast("long"))

  /** Per-document encode summary under trained merges:
    * (doc_id, n_tokens, n_oov, ids_checksum). The merge fold runs once
    * per DISTINCT word of the ENCODE corpus (so unseen words still
    * decompose — char fallback is automatic, and only symbols absent
    * from training land OOV with id 0); the word→tokens table and the
    * symbol vocabulary broadcast into the document scan. Checksum =
    * Σ wpos·tpos·(id+7) mod 1e9+7 over 1-based word/token positions —
    * order-sensitive, pure int64, replayed exactly by the oracle. */
  def encodeSummary(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge], symVocab: DataFrame): DataFrame = {
    val encTypes = docs.select(explode(words(docs, textCol)).as("w"))
      .distinct()
      .withColumn("ss", merges.foldLeft(wrapped(col("w")): Column) {
        (c, m) => applyMerge(c, m.lhs, m.rhs)
      })
      .withColumn("toks", split(trim(col("ss")), "  "))
      .select(col("w"), col("toks"))
    val docToks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(words(docs, textCol)).as(Seq("wpos0", "w")))
      .join(broadcast(encTypes), Seq("w"))
      .select(col("doc_id"), (col("wpos0") + 1L).as("wpos"),
        posexplode(col("toks")).as(Seq("tpos0", "sym")))
      .select(col("doc_id"), col("wpos"), (col("tpos0") + 1L).as("tpos"),
        col("sym"))
    docToks
      .join(broadcast(symVocab), Seq("sym"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_oov"),
        pmod(sum(pmod(col("wpos") * col("tpos") * (coalesce(col("id"),
          lit(0L)) + 7L), lit(M))), lit(M)).as("ids_checksum"))
  }
}
