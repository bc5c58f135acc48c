package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable fixed-dimension sum buffer for [[VectorMeanAggregator]]. */
case class VecSum(sum: Array[Double], var n: Long)

/** Per-group embedding centroid as a typed `Aggregator`: one fixed-`dim`
  * double buffer per group with map-side partials — the scale-right
  * shape for vector averaging. The explode-and-regroup alternative
  * (posexplode → groupBy (key, dim)) shuffles |rows|·dim scalar records
  * where this shuffles one dim-length array per group per map task, a
  * ~dim× reduction at any corpus size; a giant label concentrates into
  * partial buffers, never one reducer. This is the centroid step a
  * production IVF coarse quantizer trains with (llm/Similarity.scala
  * uses a hash-sampled quantizer at harness scale).
  *
  * Input vectors are raw `array<float>` widened per element (same
  * convention as [[DotProduct]] — embeddings are never pre-cast to
  * doubled arrays). Null or wrong-length vectors are skipped, counted
  * in neither sum nor divisor.
  */
class VectorMeanAggregator(dim: Int)
    extends Aggregator[Array[Float], VecSum, Array[Double]] {

  override def zero: VecSum = VecSum(new Array[Double](dim), 0L)

  override def reduce(buf: VecSum, in: Array[Float]): VecSum = {
    if (in != null && in.length == dim) {
      var i = 0
      while (i < dim) { buf.sum(i) += in(i); i += 1 }
      buf.n += 1
    }
    buf
  }

  override def merge(a: VecSum, b: VecSum): VecSum = {
    var i = 0
    while (i < dim) { a.sum(i) += b.sum(i); i += 1 }
    a.n += b.n
    a
  }

  override def finish(r: VecSum): Array[Double] =
    if (r.n == 0L) null else r.sum.map(_ / r.n)

  override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

/** `array<double>` input twin of [[VectorMeanAggregator]] — residual-PQ
  * trains codebooks over double residual vectors, and routing them
  * through the float encoder would silently narrow every element before
  * summation, breaking the oracle's double-arithmetic replay. Same
  * buffer, skip, and finish semantics. */
class VectorMeanDoubleAggregator(dim: Int)
    extends Aggregator[Array[Double], VecSum, Array[Double]] {

  private val inner = new VectorMeanAggregator(dim)

  override def zero: VecSum = inner.zero

  override def reduce(buf: VecSum, in: Array[Double]): VecSum = {
    if (in != null && in.length == dim) {
      var i = 0
      while (i < dim) { buf.sum(i) += in(i); i += 1 }
      buf.n += 1
    }
    buf
  }

  override def merge(a: VecSum, b: VecSum): VecSum = inner.merge(a, b)
  override def finish(r: VecSum): Array[Double] = inner.finish(r)
  override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object VectorMeanAggregator {
  /** DataFrame-callable form: `vecMean(64)(col("embedding"))`. */
  def vecMean(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new VectorMeanAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())

  /** `array<double>` form: `vecMeanDouble(16)(col("residual_slice"))`. */
  def vecMeanDouble(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new VectorMeanDoubleAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]())
}
