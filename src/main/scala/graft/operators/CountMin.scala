package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: frequency estimation over a token stream in
  * O(depth × width) memory, independent of vocabulary size — the
  * frequency-sketch sibling of [[KmvDistinct]] (SURVEY §7.3 "sketches"
  * contingency; the reference's closest analog is `oink/wordfreq.cpp`'s
  * exact per-proc count map, which is O(vocabulary)). Every hash is the
  * repo's portable integer arithmetic, so the DuckDB oracle replays not
  * just the error BOUND but the exact estimates, collisions included.
  *
  * Sketch: bucket(i, token) = ((wordHash · A + (seed+i)·40503) mod M)
  * mod width for each of `depth` independent rows; cell (i, b) counts
  * occurrences hashing there; estimate(token) = min over i of its cell
  * — the classic overcount-only bound (est ≥ exact always; ε ≈ e/width
  * overcount mass per row at δ ≈ e^−depth).
  *
  * 100 TB shape: the token scan explodes to (i, bucket) int pairs whose
  * groupBy partial-aggregates map-side to ≤ depth·width rows per
  * partition — the shuffle carries sketch CELLS, never tokens, and the
  * finished sketch (depth·width rows) broadcasts into any number of
  * probe joins. Skew is structurally irrelevant: a hot token folds into
  * one cell per row map-side, the reduce side sums longs.
  */
object CountMin {

  /** Portable mixer modulus/multiplier (the Sampling/KMV constants). */
  val M = 1000000007L
  val A = 2654435761L

  private def bucket(h: Column, i: Int, width: Int, seed: Long): Column =
    pmod(pmod(h * lit(A) + lit((seed + i) * 40503L), lit(M)), lit(width.toLong))

  /** The non-empty whitespace tokens of `textCol` as column `w` (the
    * SimHash-family tokenization: `list_filter(length > 0)` oracle-side). */
  def tokens(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)

  /** The depth×width sketch of the token stream: (i, bucket, c). */
  def sketch(words: DataFrame, wordCol: String, depth: Int, width: Int,
      seed: Long): DataFrame = {
    val h = graft.functions.WordHash.wordHash(col(wordCol))
    words.select(explode(array((0 until depth).map { i =>
        struct(lit(i).as("i"), bucket(h, i, width, seed).as("bucket"))
      }: _*)).as("s"))
      .select(col("s.i").as("i"), col("s.bucket").as("bucket"))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** CMS estimates for the exact top-`topK` tokens (count desc, token
    * tiebreak), paired with the exact counts: (word, n_exact, n_est).
    * The exact side is the validation harness — a production probe set
    * is whatever candidate list needs frequencies (the sketch answers
    * any probe without re-scanning the corpus). est ≥ exact always. */
  def heavyHitters(docs: DataFrame, textCol: String, topK: Int = 20,
      depth: Int = 4, width: Int = 1024, seed: Long = 11L): DataFrame = {
    val words = tokens(docs, textCol)
    val sk = broadcast(sketch(words, "w", depth, width, seed))
    val exact = words.groupBy(col("w"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("w").asc)
      .limit(topK)
    val h = graft.functions.WordHash.wordHash(col("w"))
    val probes = exact.select(col("w"), col("n_exact"),
        explode(array((0 until depth).map { i =>
          struct(lit(i).as("i"), bucket(h, i, width, seed).as("bucket"))
        }: _*)).as("s"))
      .select(col("w"), col("n_exact"), col("s.i").as("i"),
        col("s.bucket").as("bucket"))
    probes.join(sk, Seq("i", "bucket"))
      .groupBy(col("w"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .select(col("w").as("word"), col("n_exact"), col("n_est"))
  }
}
