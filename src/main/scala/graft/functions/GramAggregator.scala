package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator accumulating the upper triangle of a Gram matrix
  * Σ v vᵀ over ARRAY<FLOAT> factor rows — a k(k+1)/2-double buffer that
  * partial-aggregates map-side and merges associatively, so the full
  * factor table never moves (the reduction that powers VᵀV in the
  * antidote gradient and the factor second moments).
  */
class GramAggregator(k: Int)
    extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = new Array[Double](k * (k + 1) / 2)

  override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
    var idx = 0
    var i = 0
    while (i < k) {
      var j = i
      while (j < k) {
        buf(idx) += v(i).toDouble * v(j).toDouble
        idx += 1; j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  // primitive-array ExpressionEncoder: the buffer ser/de on every partial
  // merge is a flat double-array copy, not Java object serialization
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
