package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate COUNT DISTINCT via a KMV (k-minimum-values) sketch — the
  * cardinality estimator whose state is a bounded set of the k smallest
  * hash values per group (SURVEY §2.1#24's kv_stats "unique keys" signal
  * made sketch-shaped; same role as HyperLogLog in `approx_count_
  * distinct`, but built on the repo's PORTABLE integer mixer so the
  * estimate — not just its error bound — is deterministic and any engine
  * (the DuckDB oracle) replays it bit for bit; Spark's HLL++ sketch
  * bytes are engine-private, which is why it can't be oracle-checked).
  *
  * Estimator: hashes are uniform on [0, M); with h_k the k-th smallest
  * DISTINCT hash of a group, estimate = ⌊(k−1)·(M+1)/(h_k+1)⌋; a group
  * with fewer than k distinct hashes is EXACT (the sketch saw every
  * value). 100 TB shape: one aggregation whose buffer is ≤ k longs
  * regardless of group size — map-side partials combine sketches, the
  * shuffle carries at most k values per (partition, group), and skewed
  * groups cost O(k) memory like every bounded aggregator here
  * ([[graft.functions.TopKIdsAggregator]] discipline). Hash collisions
  * fold values BEFORE sketching (M ≈ 2³⁰: ~0.05 % relative at 10⁶ true
  * distinct) — acceptable for the estimator's own ~1/√k error tier; both
  * engines fold identically so the check stays exact.
  */
object KmvDistinct {

  /** Portable mixer modulus/multiplier (the Sampling/IVF constants). */
  val M = 1000000007L
  val A = 2654435761L

  /** Deterministic hash of a numeric key onto [0, M). Outer pmod (not
    * `%`): a negative `seed` makes the pre-mod sum negative, and a
    * negative "hash" would silently corrupt the k-smallest ordering the
    * estimator depends on (same discipline as `Sampling.bucket`). For
    * seed ≥ 0 the two operators agree, so existing oracles replay
    * unchanged. */
  def hashed(key: Column, seed: Long = 7L): Column =
    pmod(pmod(key.cast("long"), lit(M)) * lit(A) + lit(seed * 40503L), lit(M))

  class KmvSketchAggregator(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.contains(h)) buf
      else if (buf.size < k) (buf :+ h).sorted
      else if (h >= buf.last) buf
      else (buf :+ h).sorted.take(k)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** (groupCols..., approx_distinct): KMV estimate of distinct `key`
    * per group. */
  def approxDistinct(df: DataFrame, key: Column, groupCols: Seq[Column],
      k: Int = 64, seed: Long = 7L): DataFrame = {
    val kmv = udaf(new KmvSketchAggregator(k), Encoders.scalaLong)
    df.groupBy(groupCols: _*)
      .agg(kmv(hashed(key, seed)).as("sketch"))
      .select(groupCols :+
        when(size(col("sketch")) < k, size(col("sketch")).cast("long"))
          .otherwise(expr(
            s"(${k - 1}L * ${M + 1}L) div (element_at(sketch, $k) + 1L)"))
          .as("approx_distinct"): _*)
  }
}
