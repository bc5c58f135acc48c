package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data shaping beyond the reference's surface: document
  * chunking (fixed windows with overlap, the retrieval/embedding prep
  * step) and sequence packing (fill fixed-token context windows, the
  * pretraining batch prep step). Both are deliberately shuffle-minimal:
  * chunking is a pure generator projection (zero shuffle at any corpus
  * size); packing is one partitioned window + one aggregation on the
  * same key prefix.
  */
object Chunking {

  /** Fixed character windows of `width` every `stride` chars (overlap =
    * width − stride). Emits (id, chunk_id, chunk). A document shorter
    * than `width` yields its whole text as chunk 0; empty documents are
    * dropped. Pure projection + generator — no shuffle, codegen'd, so at
    * 100 TB this is exactly one pass over the corpus.
    */
  def chunkDocs(docs: DataFrame, textCol: String, idCol: String,
      width: Int = 240, stride: Int = 180): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    docs.where(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol),
        posexplode(sequence(lit(0), length(col(textCol)) - 1, lit(stride)))
          .as(Seq("pos", "off")))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col(textCol).substr(col("off") + 1, lit(width)).as("chunk"))
  }

  /** Pack documents into fixed-capacity token sequences, greedy in
    * `idCol` order within each `groupCol` partition: a document starts
    * in the pack its preceding cumulative token count falls in
    * (boundary documents straddle — the standard pretraining layout
    * where an example can cross into the next context window rather
    * than wasting the tail). Returns one row per pack:
    * (group, pack_id, n_docs, tokens).
    *
    * Scale: the running sum is a window partitioned by `groupCol`
    * (source/shard — bounded cardinality per partition), never a global
    * single-partition window; the follow-up aggregate shares the
    * partitioning prefix. Token counting is the native one-scan
    * [[graft.functions.TextStats]] expression.
    */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String, capacity: Int = 256): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val tokens: Column =
      element_at(graft.functions.TextStats.textStats(col(textCol),
        TextAnalysis.stopwords), 1)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(groupCol), col(idCol), tokens.as("tokens"))
      .withColumn("pack_id",
        floor(coalesce(sum(col("tokens")).over(w), lit(0L)) / capacity)
          .cast("long"))
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tokens"))
  }
}
